"""fastcdc_rs_ray — Ray-Data-native content-defined chunking + near-dup engine.

Built from scratch against the behavior of nlfiedler/fastcdc-rs (reference
at /root/reference); see SURVEY.md for the blueprint and per-module
docstrings for file:line parity citations.
"""

from ._mem import tune_allocator

tune_allocator()  # applies in every process that imports the package (driver and Ray workers)


def ensure_data_context() -> None:
    """Configure Ray Data for this engine: hash-shuffle strategy (keyed
    ``repartition`` — our two wide stages — requires it).  Safe without an
    active Ray session; idempotent; never raises (the engine still works for
    shuffle-free stages if ray.data is unavailable)."""
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    except Exception:
        pass


ensure_data_context()
