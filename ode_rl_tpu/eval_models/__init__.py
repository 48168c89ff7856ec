from ode_rl_tpu.eval_models.lpips import LPIPS, lpips_distance
