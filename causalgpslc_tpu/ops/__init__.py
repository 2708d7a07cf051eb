from .kernels import expit, logit, process_cov, rbf_kernel_log, rbf_kernel_log_scalar
from .linalg import (
    add_jitter,
    chol_logdet,
    chol_solve,
    mvn_logpdf,
    mvn_logpdf_chol,
    mvn_sample,
    safe_cholesky,
    symmetrize,
)
from .distributions import (
    bernoulli_logit_logpdf,
    inv_gamma_logpdf,
    inv_gamma_sample,
    normal_logpdf,
)
