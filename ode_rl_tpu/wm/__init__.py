from ode_rl_tpu.wm.rssm import RSSM, NormGRUCell
from ode_rl_tpu.wm.networks import ConvEncoder, ConvDecoder, DenseHead
from ode_rl_tpu.wm.world_model import WorldModel
from ode_rl_tpu.wm.behavior import ActionHead, ImagBehavior, rssm_behavior_fns
from ode_rl_tpu.wm.tools import (
    schedule, lambda_return, Every, Once, Until, one_hot_st_sample)
