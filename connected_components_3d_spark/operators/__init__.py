"""Graph kernels, edge hygiene, dedup/similarity, and derived operators."""
