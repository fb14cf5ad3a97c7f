"""Command-line entry points — counterparts of the reference binaries
(rofl_service/src/bin/*): config_server, basic_server, basic_client
(flclients), test_train_client, plus the Python-side trainservice/observer.

  python -m rofl_tpu.cli server  -c cfg.yml -a 0.0.0.0 -p 50051 [--dleval]
  python -m rofl_tpu.cli clients -n 4 -a ::1 -p 50051 [-r TRAINER_PORT]
  python -m rofl_tpu.cli trainservice -p 50016 [--dummy | --mock-cifar]
  python -m rofl_tpu.cli observer -a ::1 -p 50051
  python -m rofl_tpu.cli test-train -p 50016
"""

from __future__ import annotations

import argparse
import asyncio
import logging

import numpy as np


def _add_common(p):
    p.add_argument("-a", "--address", default="127.0.0.1")
    p.add_argument("-p", "--port", type=int, default=50051)


def cmd_server(args):
    from .fl.config import load_experiment
    from .fl.server import serve

    exp = load_experiment(args.config, lazy_eval=args.dleval,
                          std_init=args.initstd)
    exp.server.verification_threads = args.vthreads
    exp.server.terminate_on_done = True
    asyncio.run(serve(exp.server, f"{args.address}:{args.port}"))


def cmd_basic_server(args):
    """Hardcoded smoke server: 19166-param Plain model (basic_server.rs)."""
    from .fl import params as P
    from .fl.server import ServerConfig, serve

    cfg = ServerConfig(
        model_id=1, num_clients=args.num_clients, num_params=19166,
        num_rounds=args.rounds, enc_type=P.PLAIN_TYPE,
    )
    asyncio.run(serve(cfg, f"{args.address}:{args.port}"))


def cmd_clients(args):
    from .fl.client import FlServiceClient
    from .fl.trainclient import DummyTrainer, GrpcTrainer

    async def main():
        tasks = []
        for i in range(args.num_clients):
            if args.trainer_port:
                port = args.trainer_port + (i % args.numtrainers)
                trainer = GrpcTrainer(f"127.0.0.1:{port}")
            else:
                trainer = DummyTrainer()
            c = FlServiceClient(
                f"{args.address}:{args.port}", args.model_id, i, trainer,
                bench_dir=args.benchlog,
            )
            tasks.append(asyncio.create_task(c.train_model()))
        await asyncio.gather(*tasks)

    asyncio.run(main())


def cmd_trainservice(args):
    from .fl.trainservice import (
        DummyTrainService, JaxTrainService, MockCIFARTrainService,
        make_train_server,
    )

    async def main():
        if args.dummy:
            svc = DummyTrainService()
        elif args.mock_cifar:
            svc = MockCIFARTrainService()
        else:
            from .models.trainer import Trainer

            trainer = Trainer(
                args.model, args.dataset, client_id=args.client_id,
                num_clients=args.num_clients, batch_size=args.batch_size,
                local_epochs=args.epochs, lr=args.lr,
                intrinsic_dim=args.intrinsic_dim,
            )
            svc = JaxTrainService(trainer)
        server = make_train_server(svc, f"0.0.0.0:{args.port}")
        await server.start()
        logging.info("trainservice on :%d", args.port)
        await server.wait_for_termination()

    asyncio.run(main())


def cmd_observer(args):
    from .fl.observer import FLObserver
    from .models.trainer import Trainer

    evaluator = None
    if args.model:
        t = Trainer(args.model, args.dataset,
                    intrinsic_dim=args.intrinsic_dim)
        evaluator = t
    obs = FLObserver(f"{args.address}:{args.port}", args.model_id, evaluator)
    asyncio.run(obs.observe())


def cmd_test_train(args):
    """Smoke test against the trainer service (test_train_client.rs:12-35)."""
    from .fl.trainclient import GrpcTrainer

    async def main():
        t = GrpcTrainer(f"127.0.0.1:{args.port}")
        update = await t.train_for_round(None, np.zeros(19166, np.float32), 0)
        print(f"update: len={len(update)} first={update[:4]}")

    asyncio.run(main())


def _apply_platform_env():
    """Honor JAX_PLATFORMS even when a sitecustomize pre-imports jax and
    registers the TPU plugin before the env var can take effect (the same
    reason tests/conftest.py calls jax.config.update). Without this, every
    orchestrated subprocess lands on the one real TPU chip and serializes."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def main(argv=None):
    _apply_platform_env()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    ap = argparse.ArgumentParser(prog="rofl_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("server")
    _add_common(s)
    s.add_argument("-c", "--config", required=True)
    s.add_argument("--dleval", action="store_true",
                   help="lazy (pipelined) verification")
    s.add_argument("--vthreads", type=int, default=4)
    s.add_argument("--initstd", type=float, default=0.0)
    s.set_defaults(fn=cmd_server)

    s = sub.add_parser("basic-server")
    _add_common(s)
    s.add_argument("-n", "--num-clients", type=int, default=1)
    s.add_argument("--rounds", type=int, default=10)
    s.set_defaults(fn=cmd_basic_server)

    s = sub.add_parser("clients")
    _add_common(s)
    s.add_argument("-n", "--num-clients", type=int, default=1)
    s.add_argument("-r", "--trainer-port", type=int, default=0,
                   help="0 = dummy trainer (basic_client.rs:18-19)")
    s.add_argument("--numtrainers", type=int, default=1)
    s.add_argument("--model-id", type=int, default=1)
    s.add_argument("--benchlog", default=None)
    s.set_defaults(fn=cmd_clients)

    s = sub.add_parser("trainservice")
    s.add_argument("-p", "--port", type=int, default=50016)
    s.add_argument("--dummy", action="store_true")
    s.add_argument("--mock-cifar", action="store_true")
    s.add_argument("--model", default="mnist_dev")
    s.add_argument("--dataset", default="mnist")
    s.add_argument("--client-id", type=int, default=0)
    s.add_argument("--num-clients", type=int, default=1)
    s.add_argument("--batch-size", type=int, default=32)
    s.add_argument("--epochs", type=int, default=1)
    s.add_argument("--lr", type=float, default=0.1)
    s.add_argument("--intrinsic-dim", type=int, default=None)
    s.set_defaults(fn=cmd_trainservice)

    s = sub.add_parser("observer")
    _add_common(s)
    s.add_argument("--model-id", type=int, default=1)
    s.add_argument("--model", default=None)
    s.add_argument("--dataset", default="mnist")
    s.add_argument("--intrinsic-dim", type=int, default=None)
    s.set_defaults(fn=cmd_observer)

    s = sub.add_parser("test-train")
    s.add_argument("-p", "--port", type=int, default=50016)
    s.set_defaults(fn=cmd_test_train)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
