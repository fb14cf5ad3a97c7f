"""Python trainer service — rebuild of rofl_train_client service.py.

Serves FLClientTrainService.TrainForRound: collect the model float blocks,
set_weights → train(round) → stream back the delta (service.py:46-80).
Includes the Dummy (0.001s) and MockCIFAR (sleep) fakes used by the
reference's e2e harness (service.py:83-95) — here the real trainer is the
in-process JAX trainer (rofl_tpu.models.trainer).
"""

from __future__ import annotations

import asyncio
import logging
import time

import grpc
import numpy as np

from . import proto as pb
from .util import NUM_FLOATS_PACKET

logger = logging.getLogger("rofl_tpu.trainservice")


class TrainServiceBase:
    def train_model(self, weights: np.ndarray, round_id: int) -> np.ndarray:
        raise NotImplementedError

    async def TrainForRound(self, request_iterator, context):
        floats: list[float] = []
        expected = None
        round_id = 0
        async for msg in request_iterator:
            which = msg.WhichOneof("model_message")
            if which == "config":
                continue
            if which == "meta_block_message":
                expected = msg.meta_block_message.num_floats
                round_id = msg.meta_block_message.round_id
                continue
            floats.extend(msg.model_block.floats)
            if expected is not None and len(floats) >= expected:
                break
        weights = np.array(floats[:expected], np.float32)
        loop = asyncio.get_running_loop()
        update = await loop.run_in_executor(
            None, self.train_model, weights, round_id)
        n = len(update)
        meta = pb.ClientModelMessage()
        meta.meta_block_message.round_id = round_id
        meta.meta_block_message.num_floats = n
        meta.meta_block_message.num_blocks = (
            (n + NUM_FLOATS_PACKET - 1) // NUM_FLOATS_PACKET)
        yield meta
        for b in range(meta.meta_block_message.num_blocks):
            blk = pb.ClientModelMessage()
            blk.model_block.block_number = b
            blk.model_block.floats.extend(
                update[b * NUM_FLOATS_PACKET:(b + 1) * NUM_FLOATS_PACKET].tolist())
            yield blk


class JaxTrainService(TrainServiceBase):
    """Real local training: delta = train(weights) - weights."""

    def __init__(self, trainer):
        self.trainer = trainer

    def train_model(self, weights: np.ndarray, round_id: int) -> np.ndarray:
        self.trainer.set_weights(weights)
        new_w = self.trainer.train(round_id)
        return np.asarray(new_w, np.float32) - weights


class DummyTrainService(TrainServiceBase):
    """service.py:83-86: returns a constant 0.001 update."""

    def train_model(self, weights, round_id):
        return np.full(len(weights), 0.001, np.float32)


class MockCIFARTrainService(TrainServiceBase):
    """service.py:90-95: emulates CIFAR training latency (43.3 s)."""

    def __init__(self, sleep_s: float = 43.3):
        self.sleep_s = sleep_s

    def train_model(self, weights, round_id):
        time.sleep(self.sleep_s)
        return np.full(len(weights), 0.001, np.float32)


def make_train_server(service: TrainServiceBase, address: str) -> grpc.aio.Server:
    server = grpc.aio.server()
    handlers = {
        "TrainForRound": grpc.stream_stream_rpc_method_handler(
            service.TrainForRound,
            request_deserializer=pb.ClientModelMessage.FromString,
            response_serializer=lambda m: m.SerializeToString(),
        ),
    }
    server.add_generic_rpc_handlers((
        grpc.method_handlers_generic_handler(
            "flservice.FLClientTrainService", handlers),
    ))
    server.add_insecure_port(address)
    return server
