from prpe_tpu.utils.profiling import Throughput, count_flops, trace

__all__ = ["Throughput", "count_flops", "trace"]
