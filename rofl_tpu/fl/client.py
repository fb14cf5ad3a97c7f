"""FL client runtime — rebuild of client.rs FlServiceClient.

Protocol loop (client.rs:194-305): register → receive Config → receive
chunked global model → train locally (trainer bridge) → encrypt+prove
(EncModelParams::encrypt) → chunked upload; per-phase TimeState benchlog
with bandwidth (client.rs:276-287).

Blindings: the reference prototype client uses all-zero blindings
(derive_dummy_blindings, client.rs:70-72); real cancelling blindings exist
in the crypto layer (pedersen.cancelling_scalar_limbs) and can be injected
via `blinding_fn` for true multi-client secure aggregation.
"""

from __future__ import annotations

import asyncio
import logging

import grpc
import jax.numpy as jnp
import numpy as np

from . import params as P
from . import proto as pb
from .logs import BenchLogger, TimeState
from .util import CHUNK_SIZE, DataBlockStorage, chunk_bytes
from ..ops import sc

logger = logging.getLogger("rofl_tpu.client")


class FlServiceClient:
    def __init__(self, address: str, model_id: int, client_id: int, trainer,
                 blinding_fn=None, bench_dir: str | None = None):
        self.address = address
        self.model_id = model_id
        self.client_id = client_id
        self.trainer = trainer
        self.blinding_fn = blinding_fn  # (round_id, n) -> (16, n) limbs
        self.bench = BenchLogger(bench_dir or "", f"client{client_id}") \
            if bench_dir else None
        self.rng = np.random.default_rng()
        self.config = None
        self.crypto_cfg: P.CryptoConfig | None = None
        self.enc_type = P.PLAIN_TYPE
        self.final_model: np.ndarray | None = None

    def _blindings(self, round_id: int, n: int) -> jnp.ndarray:
        if self.blinding_fn is not None:
            return jnp.asarray(self.blinding_fn(round_id, n))
        return jnp.asarray(np.zeros((16, n), np.uint32))  # dummy (client.rs:70-72)

    async def train_model(self):
        async with grpc.aio.insecure_channel(self.address, options=[
            ("grpc.max_receive_message_length", 64 * 1024 * 1024),
            ("grpc.max_send_message_length", 64 * 1024 * 1024),
        ]) as channel:
            call = channel.stream_stream(
                "/flservice.Flservice/TrainModel",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=pb.TrainResponse.FromString,
            )
            outgoing: asyncio.Queue = asyncio.Queue()

            async def request_gen():
                reg = pb.TrainRequest()
                reg.start_message.model_id = self.model_id
                reg.start_message.client_id = self.client_id
                yield reg
                while True:
                    msg = await outgoing.get()
                    if msg is None:
                        return
                    yield msg

            storage = DataBlockStorage()
            time_state = TimeState()
            stream = call(request_gen())
            async for resp in stream:
                which = resp.WhichOneof("param_message")
                if which == "done_message":
                    logger.info("client %d: done", self.client_id)
                    await outgoing.put(None)
                    break
                if which == "error_message":
                    logger.error("server error: %s", resp.error_message.msg)
                    continue
                inner = resp.params.WhichOneof("model_message")
                if inner == "config":
                    self.config = resp.params.config.model_config
                    cc = resp.params.config.crypto_config
                    self.enc_type = cc.enc_type or P.PLAIN_TYPE
                    self.crypto_cfg = P.CryptoConfig(
                        value_range=cc.value_range or 8,
                        n_partition=cc.n_partition or 1,
                        l2_value_range=cc.l2_value_range or 16,
                        check_percentage=cc.check_percentage or 1.0,
                        enc_type=self.enc_type,
                    )
                    continue
                mp = resp.params.model_block
                pinner = mp.WhichOneof("param_message")
                if pinner == "param_meta":
                    time_state.reset()
                    time_state.record()
                    storage.init(mp.param_meta.round_id, mp.param_meta.num_blocks)
                    continue
                storage.apply(mp.param_block.block_number, mp.param_block.data)
                if not storage.is_done():
                    continue
                round_id = storage.round_id
                model = P.PlainParams.deserialize(storage.data()).content
                self.final_model = model
                time_state.record()  # received
                update = await self.trainer.train_for_round(
                    self.config, model, round_id)
                time_state.record()  # trained
                enc = await asyncio.get_running_loop().run_in_executor(
                    None, self._encrypt, update, round_id)
                time_state.record()  # encrypted
                sent = await self._upload(outgoing, round_id, enc)
                time_state.record()  # sent
                if self.bench:
                    time_state.log_bench_times_with_bandwidth(
                        self.bench, round_id, len(storage.data()), sent)
                logger.info("client %d: round %d uploaded (%d bytes)",
                            self.client_id, round_id, sent)

    def _encrypt(self, update: np.ndarray, round_id: int) -> bytes:
        blind = self._blindings(round_id, len(update))
        enc = P.encrypt(self.enc_type, update, blind, self.crypto_cfg, self.rng)
        return enc.serialize()

    async def _upload(self, outgoing: asyncio.Queue, round_id: int,
                      data: bytes) -> int:
        chunks = chunk_bytes(data, CHUNK_SIZE)
        meta = pb.TrainRequest()
        meta.params.param_meta.model_id = self.model_id
        meta.params.param_meta.round_id = round_id
        meta.params.param_meta.num_blocks = len(chunks)
        await outgoing.put(meta)
        for i, c in enumerate(chunks):
            msg = pb.TrainRequest()
            msg.params.param_block.block_number = i
            msg.params.param_block.data = c
            await outgoing.put(msg)
        return len(data)
