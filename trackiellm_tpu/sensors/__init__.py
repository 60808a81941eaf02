"""Sensor fusion: IMU orientation + motion state. Replacement for the
reference's src/sensors (C fusion + Rust filters crate)."""

from trackiellm_tpu.sensors.fusion import (  # noqa: F401
    MotionState,
    SensorFusion,
    SensorFusionConfig,
    WorldState,
)
from trackiellm_tpu.sensors.filters import LowPassFilter, MedianFilter  # noqa: F401
