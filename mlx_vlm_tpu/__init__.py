"""mlx_vlm_tpu — a TPU-native vision-language-model inference & fine-tuning
framework (JAX / XLA / Pallas / pjit), built from scratch with the
capabilities of Blaizzy/mlx-vlm.

Public surface parity with the reference package `mlx_vlm`:
load, generate, stream_generate, batch_generate, convert, apply_chat_template.
"""

from .generate import GenerationResult, generate, generate_step, stream_generate
from .generate.detection import detect, load_detector
from .generate.batch import batch_generate
from .prompt_utils import apply_chat_template
from .utils.loader import load, load_config, load_model
from .utils.processing import prepare_inputs
from .version import __version__

__all__ = [
    "load",
    "load_model",
    "load_config",
    "generate",
    "stream_generate",
    "generate_step",
    "batch_generate",
    "detect",
    "load_detector",
    "GenerationResult",
    "apply_chat_template",
    "prepare_inputs",
    "__version__",
]
