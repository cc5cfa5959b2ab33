"""Generated protobuf code for the wire-compatible llm.proto.

Regenerate with:
    protoc --python_out=. -I . llm.proto
"""

from . import llm_pb2

__all__ = ["llm_pb2"]
