from .mesh import chain_mesh, pooled_chain_stats, run_mcmc_sharded
from .multihost import global_chain_mesh, initialize_multihost, process_local_chain_slice
