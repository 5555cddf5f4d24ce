from foldingdiff_tpu.metrics.kl import kl_from_empirical, kl_from_dset  # noqa: F401
from foldingdiff_tpu.metrics.lddt import lddt_np, lddt_pdb  # noqa: F401
from foldingdiff_tpu.metrics.clashes import count_clashes, count_clashes_parallel  # noqa: F401
