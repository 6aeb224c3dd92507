"""First-party ONNX support: protobuf reader/writer + JAX executor.

Replaces the reference's onnxruntime dependency for the dwpose host stage
(README.md:295-303) with a TPU-compilable graph runner.
"""

from .proto import Model, Graph, Node, load_model, save_model, parse_model, encode_model  # noqa: F401
from .runtime import OnnxModel  # noqa: F401
