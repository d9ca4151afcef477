from .train_rl import train_rl

__all__ = ["train_rl"]
