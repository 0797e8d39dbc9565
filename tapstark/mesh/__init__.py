from .ntt import distributed_coset_lde, distributed_ntt
from .prover_step import make_sharded_prover_step

__all__ = ["distributed_ntt", "distributed_coset_lde", "make_sharded_prover_step"]
