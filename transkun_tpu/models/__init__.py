from .config import ModelConfig
from .transkun import TransKun, TransKunModule
