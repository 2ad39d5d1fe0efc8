"""Training-data pipeline extensions (driver mandate, beyond reference parity).

The reference repo processes one small news feed; a 100 TB corpus pipeline
additionally needs deduplication, similarity search, text analysis, and
multimodal column handling. Everything here is DataFrame-native: hash math
runs JVM-side via md5/conv/bit ops (whole-stage codegen), pair generation is
LSH-banded (never all-pairs at scale), and each builder has a DuckDB-oracle
twin generated from the same parameters so results compare bit-for-bit.
"""
