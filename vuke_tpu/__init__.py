"""vuke-tpu: TPU-native weak-Bitcoin-key search framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``oritwoen/vuke`` (a Rust CLI for security research on vulnerable Bitcoin
key generation): forward seed-space search (generate/scan), reverse key
origin analysis (analyze), secp256k1 address derivation, target matching,
Parquet storage, SQL query, cloud sync, and Iceberg registration —
re-architected as fused device programs over sharded seed lattices.
"""

__version__ = "0.5.0"
