"""End-to-end FL rounds over real gRPC: server + N clients in-process.

Mirrors the reference's cluster-free e2e (flserver + flclients -r 0 with
the Dummy trainer, README.md:128-167 / trainclient.rs:28-30).
"""

import asyncio

import numpy as np
import pytest

from rofl_tpu.fl import params as P
from rofl_tpu.fl.client import FlServiceClient
from rofl_tpu.fl.server import ServerConfig, TrainingState, make_server
from rofl_tpu.fl.trainclient import DummyTrainer
from rofl_tpu.crypto import pedersen

pytestmark = pytest.mark.slow


def run_fl(cfg: ServerConfig, n_clients: int, port: int, blinding_fns=None,
           timeout=300):
    async def main():
        state = TrainingState(cfg)
        server = make_server({cfg.model_id: state}, f"127.0.0.1:{port}")
        await server.start()
        clients = [
            FlServiceClient(
                f"127.0.0.1:{port}", cfg.model_id, i, DummyTrainer(),
                blinding_fn=blinding_fns[i] if blinding_fns else None,
            )
            for i in range(n_clients)
        ]
        tasks = [asyncio.create_task(c.train_model()) for c in clients]
        await asyncio.wait_for(state.done_event.wait(), timeout)
        await asyncio.gather(*tasks)
        await server.stop(0.5)
        return state, clients

    return asyncio.run(main())


def test_plain_two_rounds():
    cfg = ServerConfig(
        model_id=1, num_clients=3, num_params=11, num_rounds=2,
        learning_rate=1.0, enc_type=P.PLAIN_TYPE, write_model_file=False,
        bench_dir=None,
    )
    state, clients = run_fl(cfg, 3, 50151)
    # dummy trainer returns +0.001 per round per client; mean update=0.001
    np.testing.assert_allclose(state.global_model,
                               np.full(11, 0.002, np.float32), atol=1e-6)


def test_enc_range_round_with_cancelling_blindings():
    n_params = 4
    n_clients = 2
    rng = np.random.default_rng(55)
    # pre-generate cancelling blindings per round (2 rounds)
    per_round = {r: pedersen.cancelling_scalar_limbs(n_clients, n_params, rng)
                 for r in range(1)}

    def make_fn(i):
        def fn(round_id, n):
            return per_round[round_id][i]
        return fn

    cfg = ServerConfig(
        model_id=1, num_clients=n_clients, num_params=n_params, num_rounds=1,
        learning_rate=1.0, enc_type=P.ENC_RANGE_TYPE, write_model_file=False,
        bench_dir=None,
        crypto=P.CryptoConfig(value_range=8, n_partition=1,
                              enc_type=P.ENC_RANGE_TYPE),
    )
    state, clients = run_fl(cfg, n_clients, 50152,
                            blinding_fns=[make_fn(i) for i in range(n_clients)])
    # each update decodes to ~0.001 (nearest fixed-point ulp at frac7 is 0)
    # note: fp16/frac7 rounds 0.001 to 0.0; plus the reference's unity()
    # accumulator bias of +1 ulp, halved by the client average
    expected = (np.float32(1 / 128) + 0.0 * n_clients) / n_clients
    np.testing.assert_allclose(state.global_model,
                               np.full(n_params, expected, np.float32),
                               atol=1e-6)
