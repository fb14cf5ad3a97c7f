"""Trainer bridge — rebuild of trainclient.rs (FlTraining::{Dummy, Grpc}).

The FL client delegates local training either to a Dummy trainer (constant
0.001 update, trainclient.rs:28-30 — enables cluster-free e2e runs) or to a
trainer process over gRPC (10k-float FloatBlocks, infinite reconnect with
5 s backoff, trainclient.rs:31-58,77-176). A third, TPU-native option runs
an in-process JAX trainer directly (rofl_tpu.models) — no gRPC hop at all.
"""

from __future__ import annotations

import asyncio
import logging

import grpc
import numpy as np

from . import proto as pb
from .util import NUM_FLOATS_PACKET

logger = logging.getLogger("rofl_tpu.trainclient")


class DummyTrainer:
    async def train_for_round(self, config, model: np.ndarray, round_id: int) -> np.ndarray:
        return np.full(len(model), 0.001, np.float32)


class InProcessTrainer:
    """TPU-native local trainer: wraps a rofl_tpu.models trainer object with
    set_weights/train semantics (analysis_client.py:14-55 equivalent)."""

    def __init__(self, trainer):
        self.trainer = trainer

    async def train_for_round(self, config, model: np.ndarray, round_id: int) -> np.ndarray:
        loop = asyncio.get_running_loop()

        def run():
            self.trainer.set_weights(model)
            new_weights = self.trainer.train(round_id)
            return np.asarray(new_weights, np.float32) - model

        return await loop.run_in_executor(None, run)


class GrpcTrainer:
    """Streams the model to a FLClientTrainService and reassembles the
    returned update; reconnects forever with 5 s backoff on failure."""

    def __init__(self, address: str):
        self.address = address

    async def train_for_round(self, config, model: np.ndarray, round_id: int) -> np.ndarray:
        while True:
            try:
                return await self._attempt(config, model, round_id)
            except (grpc.aio.AioRpcError, ConnectionError, OSError) as e:
                logger.warning("trainer unavailable (%s); retrying in 5s", e)
                await asyncio.sleep(5.0)

    async def _attempt(self, config, model: np.ndarray, round_id: int) -> np.ndarray:
        async with grpc.aio.insecure_channel(self.address) as channel:
            call = channel.stream_stream(
                "/flservice.FLClientTrainService/TrainForRound",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=pb.ClientModelMessage.FromString,
            )

            async def request_gen():
                cfg_msg = pb.ClientModelMessage()
                if config is not None:
                    cfg_msg.config.CopyFrom(config)
                cfg_msg.config.model_id = getattr(config, "model_id", 0) if config else 0
                yield cfg_msg
                n = len(model)
                num_blocks = (n + NUM_FLOATS_PACKET - 1) // NUM_FLOATS_PACKET
                meta = pb.ClientModelMessage()
                meta.meta_block_message.model_id = cfg_msg.config.model_id
                meta.meta_block_message.round_id = round_id
                meta.meta_block_message.num_blocks = num_blocks
                meta.meta_block_message.num_floats = n
                yield meta
                for b in range(num_blocks):
                    blk = pb.ClientModelMessage()
                    blk.model_block.block_number = b
                    blk.model_block.floats.extend(
                        model[b * NUM_FLOATS_PACKET:(b + 1) * NUM_FLOATS_PACKET].tolist()
                    )
                    yield blk

            floats: list[float] = []
            expected = None
            async for resp in call(request_gen()):
                which = resp.WhichOneof("model_message")
                if which == "meta_block_message":
                    expected = resp.meta_block_message.num_floats
                elif which == "model_block":
                    floats.extend(resp.model_block.floats)
                    if expected is not None and len(floats) >= expected:
                        break
            return np.array(floats[:expected], np.float32)
