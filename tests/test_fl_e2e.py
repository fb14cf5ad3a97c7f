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
           timeout=1800):
    # generous timeout: first-run XLA:CPU compiles of the proof graphs
    # take many minutes; warm-cache runs finish in seconds
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


def _cancelling_fns(n_clients, n_params, rounds=1, seed=55):
    rng = np.random.default_rng(seed)
    per_round = {r: pedersen.cancelling_scalar_limbs(n_clients, n_params, rng)
                 for r in range(rounds)}

    def make_fn(i):
        def fn(round_id, n):
            return per_round[round_id][i]
        return fn

    return [make_fn(i) for i in range(n_clients)]


@pytest.mark.parametrize("enc_type", [
    P.ENC_L2_TYPE, P.ENC_RANGE_COMPRESSED_TYPE, P.ENC_L2_COMPRESSED_TYPE,
])
def test_all_crypto_modes_over_grpc(enc_type):
    """EncL2 / EncRangeCompressed / EncL2Compressed cross the real gRPC
    wire: serialize → deserialize → verify → accumulate → extract
    (VERDICT r1 item 5; ref configs exercise all five modes,
    ansible/experiments/mnist_e2e.yml)."""
    n_params = 4
    n_clients = 2
    cfg = ServerConfig(
        model_id=1, num_clients=n_clients, num_params=n_params, num_rounds=1,
        learning_rate=1.0, enc_type=enc_type, write_model_file=False,
        bench_dir=None,
        crypto=P.CryptoConfig(value_range=8, n_partition=1, l2_value_range=16,
                              enc_type=enc_type),
    )
    state, clients = run_fl(
        cfg, n_clients, 50160 + enc_type,
        blinding_fns=_cancelling_fns(n_clients, n_params, seed=60 + enc_type))
    assert state.status == "done"
    # dummy updates are +0.001 → quantize to 0 at frac7; the unity()
    # extraction bias (+1 ulp) averages to 1/(128·n_clients)
    expected = np.float32(1 / 128) / n_clients
    np.testing.assert_allclose(state.global_model,
                               np.full(n_params, expected, np.float32),
                               atol=1e-6)


def test_tampered_upload_fails_round():
    """A client that flips a byte in its serialized proof payload must fail
    the round (server marks the state failed), like the reference's
    verification panic (server.rs:474-484)."""
    n_params = 4
    n_clients = 2

    cfg = ServerConfig(
        model_id=1, num_clients=n_clients, num_params=n_params, num_rounds=1,
        learning_rate=1.0, enc_type=P.ENC_RANGE_TYPE, write_model_file=False,
        bench_dir=None,
        crypto=P.CryptoConfig(value_range=8, n_partition=1,
                              enc_type=P.ENC_RANGE_TYPE),
    )

    fns = _cancelling_fns(n_clients, n_params, seed=99)

    async def main():
        state = TrainingState(cfg)
        server = make_server({cfg.model_id: state}, "127.0.0.1:50171")
        await server.start()
        clients = [
            FlServiceClient("127.0.0.1:50171", cfg.model_id, i,
                            DummyTrainer(), blinding_fn=fns[i])
            for i in range(n_clients)
        ]
        # client 1 tampers: corrupt a byte deep inside the proof payload
        orig = clients[1]._encrypt

        def tampered(plaintext, round_id):
            data = bytearray(orig(plaintext, round_id))
            data[len(data) // 2] ^= 0x55
            return bytes(data)

        clients[1]._encrypt = tampered
        tasks = [asyncio.create_task(c.train_model()) for c in clients]
        try:
            await asyncio.wait_for(state.done_event.wait(), 300)
        finally:
            for t in tasks:
                t.cancel()
        await server.stop(0.5)
        return state

    state = asyncio.run(main())
    assert state.status == "failed"
    # the global model must not have been updated with tampered data
    np.testing.assert_array_equal(state.global_model,
                                  np.zeros(n_params, np.float32))


def test_late_registration_gets_status_late():
    """A client registering after training started receives STATUS_LATE and
    a clean stream end (ref server.rs:583-591) instead of hanging."""
    from rofl_tpu.fl import proto as pb

    cfg = ServerConfig(
        model_id=1, num_clients=1, num_params=4, num_rounds=1,
        learning_rate=1.0, enc_type=P.PLAIN_TYPE, write_model_file=False,
        bench_dir=None,
    )

    async def main():
        state = TrainingState(cfg)
        server = make_server({cfg.model_id: state}, "127.0.0.1:50172")
        await server.start()
        c0 = FlServiceClient("127.0.0.1:50172", cfg.model_id, 0,
                             DummyTrainer())
        t0 = asyncio.create_task(c0.train_model())
        await asyncio.wait_for(state.done_event.wait(), 300)
        # now register late
        import grpc.aio

        statuses = []
        async with grpc.aio.insecure_channel("127.0.0.1:50172") as ch:
            method = ch.stream_stream(
                "/flservice.Flservice/TrainModel",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=pb.TrainResponse.FromString,
            )
            req = pb.TrainRequest()
            req.start_message.model_id = cfg.model_id
            req.start_message.client_id = 99

            async def gen():
                yield req

            async for resp in method(gen()):
                if resp.WhichOneof("param_message") == "done_message":
                    statuses.append(resp.done_message.status)
        await t0
        await server.stop(0.5)
        return statuses

    statuses = asyncio.run(main())
    assert pb.STATUS_LATE in statuses


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
