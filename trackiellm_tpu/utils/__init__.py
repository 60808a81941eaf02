"""Foundation utilities (L0): errors, logging, config, paths.

Mirrors the reference's ``src/utils`` + ``src/internal_tools`` layer
(reference: src/utils/tk_error_handling.h, src/utils/tk_logging.h,
src/internal_tools/tk_config_parser.h, src/internal_tools/tk_file_manager.h).
"""

from trackiellm_tpu.utils.errors import ErrorCode, TrackieError, check
from trackiellm_tpu.utils.logging import get_logger, set_log_level, LogLevel
from trackiellm_tpu.utils.config import Config
from trackiellm_tpu.utils.paths import Path as TkPath

__all__ = [
    "ErrorCode",
    "TrackieError",
    "check",
    "get_logger",
    "set_log_level",
    "LogLevel",
    "Config",
    "TkPath",
]
