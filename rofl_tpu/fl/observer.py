"""Training observer — rebuild of observer.py (FLClientTrainObserver).

Connects ObserverModelTraining, reassembles each broadcast global model and
evaluates it with a local JAX model, logging "[EVAL] (round, loss, acc)"
(observer.py:45-84)."""

from __future__ import annotations

import logging

import grpc
import numpy as np

from . import params as P
from . import proto as pb
from .util import DataBlockStorage

logger = logging.getLogger("rofl_tpu.observer")


class FLObserver:
    def __init__(self, address: str, model_id: int, evaluator=None):
        """evaluator: object with set_weights(w) + evaluate() -> (loss, acc)."""
        self.address = address
        self.model_id = model_id
        self.evaluator = evaluator
        self.evals: list[tuple[int, float, float]] = []

    async def observe(self):
        async with grpc.aio.insecure_channel(self.address, options=[
            ("grpc.max_receive_message_length", 64 * 1024 * 1024),
        ]) as channel:
            call = channel.unary_stream(
                "/flservice.Flservice/ObserverModelTraining",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=pb.TrainResponse.FromString,
            )
            req = pb.ModelSelection()
            req.model_id = self.model_id
            storage = DataBlockStorage()
            async for resp in call(req):
                which = resp.WhichOneof("param_message")
                if which == "done_message":
                    logger.info("[EVAL] observer done")
                    return
                if which != "params":
                    continue
                mp = resp.params.model_block
                inner = mp.WhichOneof("param_message")
                if inner == "param_meta":
                    storage.init(mp.param_meta.round_id, mp.param_meta.num_blocks)
                    continue
                storage.apply(mp.param_block.block_number, mp.param_block.data)
                if storage.is_done():
                    model = P.PlainParams.deserialize(storage.data()).content
                    self._evaluate(storage.round_id, model)

    def _evaluate(self, round_id: int, weights: np.ndarray):
        if self.evaluator is None:
            logger.info("[EVAL] (%d, -, -) |w|=%f", round_id,
                        float(np.linalg.norm(weights)))
            return
        self.evaluator.set_weights(weights)
        loss, acc = self.evaluator.evaluate()
        self.evals.append((round_id, loss, acc))
        logger.info("[EVAL] (%d, %f, %f)", round_id, loss, acc)
