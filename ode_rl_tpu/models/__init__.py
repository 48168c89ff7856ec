from ode_rl_tpu.models.registry import build_model, MODEL_REGISTRY
from ode_rl_tpu.models.convgru import ConvGRUModel
from ode_rl_tpu.models.odeconvgru import ODEConvGRUModel
