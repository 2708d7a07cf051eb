from .mesh import chain_mesh, pooled_chain_stats, run_mcmc_sharded
