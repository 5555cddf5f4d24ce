from foldingdiff_tpu.geometry.nerf import (  # noqa: F401
    place_dihedral,
    place_dihedral_np,
    nerf_build_batch,
    nerf_build_np,
)
