from .ess import ess_update
from .gibbs import make_outer_step, run_mcmc, run_mcmc_jit, StepStats
from .mh import mh_move, mh_sweep, sweep_moves
from .proposal import drift_params, proposal_logpdf, propose
