from houv_tpu.utils.meters import AverageValueMeter, SplitMeterGrid
from houv_tpu.utils.logging_utils import setup_logging

__all__ = ["AverageValueMeter", "SplitMeterGrid", "setup_logging"]
