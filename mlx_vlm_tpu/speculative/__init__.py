from .utils import load_drafter, run_speculative_rounds, speculative_generate_step

__all__ = ["run_speculative_rounds", "speculative_generate_step", "load_drafter"]
