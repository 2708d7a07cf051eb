from .rbf import fused_rbf_cov
