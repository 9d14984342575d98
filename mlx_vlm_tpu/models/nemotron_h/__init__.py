from .config import ModelConfig, TextConfig
from .language import LanguageModel, NemotronHCache
from .nemotron_h import Model

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel",
           "NemotronHCache"]
