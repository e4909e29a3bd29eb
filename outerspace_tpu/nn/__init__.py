"""Sparse-NN workload pipeline (reference ``NN_models/``): MLP/LeNet
training, magnitude pruning, masked finetune, .mtx export, and inference
chained through the sparse TPU kernels."""

from outerspace_tpu.nn.models import MLP1, LeNet  # noqa: F401
