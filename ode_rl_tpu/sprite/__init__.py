from ode_rl_tpu.sprite.dsvae import DisentangledVAE
from ode_rl_tpu.sprite.nets import DCGANEncoder, DCGANDecoder
from ode_rl_tpu.sprite.classifier import SpriteJudge
from ode_rl_tpu.sprite.data import sprites_batch
