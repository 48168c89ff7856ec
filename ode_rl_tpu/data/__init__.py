from ode_rl_tpu.data.sprites import get_sprite_bank
from ode_rl_tpu.data.mmnist import generate_moving_mnist, MovingMNIST
from ode_rl_tpu.data.protocol import make_batch_dict, timestamps_for
from ode_rl_tpu.data.flow_labels import motion_grid_labels
