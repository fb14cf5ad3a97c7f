#!/usr/bin/env python
"""Single-host e2e experiment orchestrator — the ansible-equivalent
(reference ansible/e2ebench.yml + roles/e2e-experiment-start/*): launches
the aggregation server, optional JAX train services, N FL clients, and an
observer as subprocesses, waits for training to finish, then parses the
benchlogs into one e2e summary row (plots/data/e2e_table.csv format).

Usage:
  python scripts/run_e2e.py -c configs/example_config.yml [--trainers 2]
  python scripts/run_e2e.py -c configs/mnist_range_e2e.yml --dummy
"""

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


PLATFORM = "cpu"  # set from --platform; applied to EVERY subprocess


def launch(name, args, logdir, env=None):
    os.makedirs(logdir, exist_ok=True)
    logpath = os.path.join(logdir, f"{name}.log")
    with open(logpath, "w") as out:
        # Every child gets an explicit platform: without it the axon
        # sitecustomize pins each one to the single real TPU chip and the
        # whole experiment serializes over the tunnel (the round-2
        # 415-1048 s/round trainer phases were exactly this).
        p = subprocess.Popen(
            [sys.executable, "-m", "rofl_tpu.cli"] + args,
            stdout=out, stderr=subprocess.STDOUT, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": PLATFORM, **(env or {})},
            start_new_session=True,
        )
    p.logpath = logpath
    print(f"[{name}] pid={p.pid}: rofl_tpu.cli {' '.join(args)}")
    return p


def check_alive(p, name):
    """Abort early (with the log tail) if a freshly-launched process died."""
    if p.poll() is not None:
        tail = ""
        try:
            with open(p.logpath) as f:
                tail = "".join(f.readlines()[-20:])
        except OSError:
            pass
        raise SystemExit(
            f"[{name}] exited during startup (rc={p.returncode}); log tail:\n{tail}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-p", "--port", type=int, default=50551)
    ap.add_argument("--trainer-port", type=int, default=50616)
    ap.add_argument("--trainers", type=int, default=0,
                    help="number of JAX trainservice processes (0 = dummy)")
    ap.add_argument("--dummy", action="store_true",
                    help="use the in-client dummy trainer (no grpc trainer)")
    ap.add_argument("--observer", action="store_true")
    ap.add_argument("--logdir", default="benchlog")
    ap.add_argument("--timeout", type=float, default=1800)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "axon"],
                    help="JAX platform for every subprocess")
    args = ap.parse_args()
    global PLATFORM
    PLATFORM = args.platform

    import yaml

    with open(args.config) as f:
        doc = yaml.safe_load(f)
    n_clients = int(doc.get("environment", {}).get("num_clients", 1))
    model_name = doc.get("client", {}).get("model_name", "mnist_dev")
    dataset = doc.get("dataset", {}).get("dataset", "mnist")
    intrinsic = doc.get("server", {}).get("intrinsic_dimension")

    procs = []
    t0 = time.time()
    try:
        server = launch("server", [
            "server", "-c", args.config, "-a", "127.0.0.1",
            "-p", str(args.port),
        ], args.logdir)
        procs.append(server)
        time.sleep(3)
        check_alive(server, "server")

        trainer_flag = []
        if args.trainers > 0 and not args.dummy:
            for i in range(args.trainers):
                t_args = ["trainservice", "-p", str(args.trainer_port + i),
                          "--model", model_name, "--dataset", dataset,
                          "--client-id", str(i),
                          "--num-clients", str(n_clients)]
                if intrinsic:
                    t_args += ["--intrinsic-dim", str(intrinsic)]
                procs.append(launch(f"trainservice{i}", t_args, args.logdir))
            trainer_flag = ["-r", str(args.trainer_port),
                            "--numtrainers", str(args.trainers)]
            time.sleep(3)

        if args.observer:
            procs.append(launch("observer", [
                "observer", "-a", "127.0.0.1", "-p", str(args.port),
                "--model", model_name, "--dataset", dataset,
            ] + (["--intrinsic-dim", str(intrinsic)] if intrinsic else []),
                args.logdir))

        clients = launch("clients", [
            "clients", "-n", str(n_clients), "-a", "127.0.0.1",
            "-p", str(args.port), "--benchlog", args.logdir,
        ] + trainer_flag, args.logdir)
        procs.append(clients)

        # wait for the server to finish (it exits when training completes)
        while server.poll() is None:
            if time.time() - t0 > args.timeout:
                print("TIMEOUT — killing experiment")
                break
            time.sleep(2)
    finally:
        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(p.pid, signal.SIGTERM)
                except ProcessLookupError:
                    pass
        time.sleep(1)
        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass

    print(f"\nexperiment done in {time.time() - t0:.1f}s; parsing benchlogs")
    subprocess.run([sys.executable, "scripts/parse_benchlog.py",
                    args.logdir], cwd=REPO, check=False)


if __name__ == "__main__":
    main()
