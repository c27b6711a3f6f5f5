"""Vectorized column functions: analysis chain, SmallFloat, FOR packing, text stats."""
