"""Utilities: timing, profiling, performance forensics."""
from .profiling import (DeviceTimer, force, memory_stats,
                        profile_trace, throughput_forensics)

__all__ = ["DeviceTimer", "force", "profile_trace", "memory_stats",
           "throughput_forensics"]
