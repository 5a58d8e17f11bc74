"""Telemetry: server/client performance monitors + device profiling."""

from facerecognitionpipeline_tpu.telemetry.monitor import (  # noqa: F401
    PerformanceMonitorClient,
    PerformanceMonitorServer,
    PerformanceMonitor,
)
