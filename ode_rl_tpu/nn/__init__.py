from ode_rl_tpu.nn.convgru import ConvGRUCell, convgru_scan, convgru_freerun
from ode_rl_tpu.nn.conv_stacks import ConvEncoder, ConvDecoder, ConvNet
from ode_rl_tpu.nn.odeconvgru import ODEConvGRUEncoder
