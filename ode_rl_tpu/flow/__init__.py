from ode_rl_tpu.flow.flownets import (
    FlowNetS, FlowNetC, FlowNetSD, FlowNetFusion, FlowNet2, FlowNetCS,
    FlowNetCSS)
from ode_rl_tpu.flow.losses import epe, multiscale_loss
