from ode_rl_tpu.core.config import Config, load_config, add_cli_overrides
from ode_rl_tpu.core.checkpoint import CheckpointManager
