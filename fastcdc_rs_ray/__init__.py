"""fastcdc_rs_ray — Ray-Data-native content-defined chunking + near-dup engine.

Built from scratch against the behavior of nlfiedler/fastcdc-rs (reference
at /root/reference); see SURVEY.md for the blueprint and per-module
docstrings for file:line parity citations.
"""

from ._mem import tune_allocator

tune_allocator()  # applies in every process that imports the package (driver and Ray workers)
