from .ntt import distributed_coset_lde, distributed_ntt
from .prover_step import make_sharded_prover_step

__all__ = ["distributed_ntt", "distributed_coset_lde", "make_sharded_prover_step"]


def initialize_multihost(**kwargs) -> None:
    """Multi-host mesh bootstrap: jax.distributed.initialize passthrough
    (coordinator address/process ids via env or kwargs). On a single host
    this is a no-op; on a pod slice call it before building meshes so
    jax.devices() spans all hosts (SURVEY.md §2.3 communication backend)."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # already initialized or single-process
        import logging

        logging.getLogger(__name__).info("multihost init skipped: %s", e)
