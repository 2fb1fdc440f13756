from houv_tpu.train.config import Config, load_config
from houv_tpu.train.schedules import alpha_schedule, lr_schedule
from houv_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from houv_tpu.train.harness import CompletionTrainer, RegistrationTrainer
from houv_tpu.train.submission import write_results_h5, write_submission

__all__ = [
    "Config",
    "load_config",
    "alpha_schedule",
    "lr_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "CompletionTrainer",
    "RegistrationTrainer",
    "write_results_h5",
    "write_submission",
]
