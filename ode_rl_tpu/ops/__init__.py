"""Named ops replacing the reference's native CUDA kernels.

The reference ships exactly three CUDA ops (SURVEY §2.5, all under
/root/reference/flownet2-pytorch/networks/):
  * correlation_cuda — FlowNetC cost volume            → ops/correlation.py
  * resample2d_cuda  — bilinear flow-field warping     → ops/warp.py
  * channelnorm_cuda — per-pixel L2 norm over channels → ops/channelnorm.py

Here each is a named op with (a) a Pallas TPU kernel where the memory/
compute pattern benefits and (b) a pure-XLA path used on CPU and as the
numerics reference in tests. ops/gru_gates.py additionally provides the
fused ConvGRU gate pointwise kernels (SURVEY §7 hard-part #4).
"""

from ode_rl_tpu.ops.channelnorm import channelnorm
from ode_rl_tpu.ops.warp import resample2d, grid_sample
from ode_rl_tpu.ops.correlation import correlation
from ode_rl_tpu.ops.gru_gates import fused_gru_gates, fused_gru_blend
