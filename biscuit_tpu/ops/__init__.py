"""TPU compute kernels: fused MC-dropout head (Pallas), jittable ROC/
threshold search, segment reductions for slide aggregation."""
