from .checkpoint import load_chain_state, run_mcmc_checkpointed, save_chain_state
from .mesh import chain_mesh, pooled_chain_stats, run_mcmc_sharded
from .multihost import global_chain_mesh, initialize_multihost, process_local_chain_slice
