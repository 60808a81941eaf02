"""Navigation: ground-plane estimation, traversability mapping,
free-space analysis, obstacle tracking. Replacement for the reference's
src/navigation (C) + the Rust navigation crate."""

from trackiellm_tpu.navigation.path_planner import (  # noqa: F401
    CellClass,
    NavigationConfig,
    NavigationEngine,
    ransac_ground_plane,
)
from trackiellm_tpu.navigation.free_space import (  # noqa: F401
    FreeSpaceDetector,
    SpaceSector,
)
from trackiellm_tpu.navigation.obstacle_tracker import (  # noqa: F401
    ObstacleTracker,
    TrackedObstacle,
)
