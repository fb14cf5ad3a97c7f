"""Dynamic protobuf bindings for the flservice wire contract.

The environment ships protoc 3.21 with a protobuf 6.x Python runtime, so
statically generated _pb2.py files would hit gencode/runtime version checks.
Instead we compile the .proto to a FileDescriptorSet once (cached next to
the source) and build message classes dynamically via the descriptor pool —
version-independent and still the exact same wire format as the reference's
tonic/prost stack (rofl_service/build.rs:1-4).

Usage:  from rofl_tpu.fl import proto as pb
        msg = pb.TrainRequest(); msg.start_message.model_id = 1
"""

from __future__ import annotations

import os
import subprocess

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_DIR = os.path.dirname(os.path.abspath(__file__))
_PROTO = os.path.join(_DIR, "flservice.proto")
_DESC = os.path.join(_DIR, "flservice.desc")


def _ensure_descriptor() -> bytes:
    if (not os.path.exists(_DESC)
            or os.path.getmtime(_DESC) < os.path.getmtime(_PROTO)):
        subprocess.run(
            ["protoc", f"-I{_DIR}", f"--descriptor_set_out={_DESC}", _PROTO],
            check=True,
            capture_output=True,
        )
    with open(_DESC, "rb") as f:
        return f.read()


_pool = descriptor_pool.DescriptorPool()
_fds = descriptor_pb2.FileDescriptorSet.FromString(_ensure_descriptor())
for _file in _fds.file:
    _pool.Add(_file)

_file_desc = _pool.FindFileByName("flservice.proto")

_MESSAGES = [
    "MetaFloatBlockMessage", "FloatBlock", "ClientModelMessage", "ModelConfig",
    "CryptoConfig", "DataBlock", "EncRangeData", "EncNormData",
    "EncNormDataCompressed", "Config", "ServerModelData",
    "WorkerRegisterMessage", "ModelRegisterResponse", "StatusMessage",
    "ErrorMessage", "ModelParameters", "TrainRequest", "TrainResponse",
    "ModelSelection",
]

for _name in _MESSAGES:
    _desc = _pool.FindMessageTypeByName(f"flservice.{_name}")
    globals()[_name] = message_factory.GetMessageClass(_desc)

ModelParametersMeta = message_factory.GetMessageClass(
    _pool.FindMessageTypeByName("flservice.ModelParameters.ModelParametersMeta")
)

STATUS_OK = 0
STATUS_NOK = 1
STATUS_LATE = 2
STATUS_DONE = 3


def encode_length_delimited(msg) -> bytes:
    """prost encode_length_delimited: varint length prefix + payload
    (params.rs serialize())."""
    payload = msg.SerializeToString()
    out = bytearray()
    n = len(payload)
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            break
    return bytes(out) + payload


def decode_length_delimited(msg_cls, data: bytes):
    """prost decode_length_delimited."""
    shift = 0
    n = 0
    i = 0
    while True:
        b = data[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            break
        shift += 7
    msg = msg_cls()
    msg.ParseFromString(data[i:i + n])
    return msg
