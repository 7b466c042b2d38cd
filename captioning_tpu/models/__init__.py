from .api import Captioner, setup  # noqa: F401
from .harness import ModelConfig, config_from_opt  # noqa: F401
