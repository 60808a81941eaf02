"""Services & ops: monitoring, profiling, security, networking,
deployment, plugins, experiments. Replacement for the reference's Rust
service crates (src/{monitoring,profiling,security,networking,
deployment,integration,experiments})."""

from trackiellm_tpu.services.monitoring import (  # noqa: F401
    MetricsCollector,
    MonitoringService,
    TelemetrySender,
)
from trackiellm_tpu.services.profiling import Profiler, profile_scope  # noqa: F401
from trackiellm_tpu.services.security import AuthManager, KeyManager  # noqa: F401
from trackiellm_tpu.services.networking import (  # noqa: F401
    ConnectionPool,
    FrameDecoder,
    encode_frame,
)
from trackiellm_tpu.services.deployment import (  # noqa: F401
    DeploymentService,
    PackageManager,
    VersionChecker,
)
from trackiellm_tpu.services.integration import PluginManager  # noqa: F401
from trackiellm_tpu.services.experiments import (  # noqa: F401
    ExperimentService,
    MetricsComparator,
)
