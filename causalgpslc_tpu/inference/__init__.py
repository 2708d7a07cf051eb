from .ess import ess_update
from .gibbs import make_outer_step, run_mcmc, run_mcmc_jit, StepStats
from .mh import (
    ProposalParams,
    mh_move,
    mh_move_dr,
    mh_sweep,
    proposal_params_for,
    resolve_move_proposals,
    sweep_moves,
)
from .proposal import drift_params, proposal_logpdf, propose
