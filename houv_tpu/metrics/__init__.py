from houv_tpu.metrics.cd import (
    calc_cd,
    calc_cd_percent,
    calc_cd_percent_aligned,
    calc_cd_percent_len,
    loss_view,
    fscore,
)
from houv_tpu.metrics.emd import calc_emd

__all__ = [
    "calc_cd",
    "calc_cd_percent",
    "calc_cd_percent_aligned",
    "calc_cd_percent_len",
    "loss_view",
    "fscore",
    "calc_emd",
]
