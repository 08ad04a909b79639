from flowdenoising_tpu.utils.logging import setup_logging, log_volume_stats
from flowdenoising_tpu.utils.progress import ProgressReporter
from flowdenoising_tpu.utils.fingerprint import file_fingerprint
from flowdenoising_tpu.utils.profiler import PhaseProfiler

__all__ = ["setup_logging", "log_volume_stats", "ProgressReporter",
           "file_fingerprint", "PhaseProfiler"]
