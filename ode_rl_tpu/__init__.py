"""ode_rl_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
continuous-time video prediction and sequential representation learning.

Built from scratch with the capability surface of the jithendaraa/ODE-RL
reference (see SURVEY.md): Neural-ODE latent video models (ODE-ConvGRU,
Vid-ODE), discrete-time ConvGRU predictors, disentangled sequential VAEs
(S3VAE family), object-centric modules (slot attention, RIMs), and the
native ops the reference implements in CUDA (correlation, resample2d,
channelnorm) re-implemented as Pallas/XLA TPU kernels.

Design principles (TPU-first, not a port):
  * whole-train-step compilation under ``jax.jit`` — no Python in the hot
    loop, recurrences are ``lax.scan``, adaptive ODE stepping is a bounded
    on-device loop (never escapes to the host per RK stage);
  * NHWC layout + bf16 compute / fp32 params to feed the MXU;
  * SPMD via ``jax.sharding.Mesh`` + named-axis shardings (data axis for
    video batches); collectives ride ICI and are inserted by XLA;
  * explicit PRNG-key threading for all stochasticity.
"""

__version__ = "0.1.0"
