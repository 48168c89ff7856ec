from ode_rl_tpu.ode.solvers import odeint, odeint_aux, ODEStats
from ode_rl_tpu.ode.interp import interp_fit, interp_eval
