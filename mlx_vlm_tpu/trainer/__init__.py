from .sft import make_train_step, sft_loss

__all__ = ["make_train_step", "sft_loss"]
