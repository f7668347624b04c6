"""Worker that drives the REAL train CLI under jax.distributed.

Launched by ``tests/test_multihost.py`` (never collected by pytest). Unlike
``multihost_worker.py`` (which exercises the parallel step functions), this
one runs ``dahpe_tpu.cli.train.main`` itself — arg parsing, the
``--multihost`` initialize (via the DAHPE_COORDINATOR env contract,
``cli/train.py``), process-0-gated checkpoint/metrics writes, the SIGTERM
drain consensus, and ``--resume`` — the full CLI surface under 2 processes.

Any ``@PID@`` token in the CLI args is replaced with this worker's process
id (per-process log dirs simulate hosts without a shared filesystem, which
is what makes the process-0-only-writes assertion observable).
"""

import os
import sys


def main():
    coordinator, num_processes, process_id, local_devices = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    cli_args = [a.replace("@PID@", str(process_id)) for a in sys.argv[5:]]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    # Raise Gloo's lazy full-mesh connect timeout: under suite load the two
    # workers reach their first collective minutes apart (compiles are slow
    # on this one-core box) and the default timeout loses the race (VERDICT
    # r4 reproduced the flake).  CPU-only knob — set BEFORE importing jax.
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
        " --xla_cpu_collective_timeout_seconds=1200"
    ).strip()
    # the CLI's --multihost reads these (explicit coordinator config)
    os.environ["DAHPE_COORDINATOR"] = coordinator
    os.environ["DAHPE_NUM_PROCESSES"] = str(num_processes)
    os.environ["DAHPE_PROCESS_ID"] = str(process_id)
    # the XLA:CPU AOT cache records host features that fail to reload in
    # this container (CLAUDE.md) — keep the rehearsal cache-free
    os.environ["DAHPE_JAX_CACHE"] = ""

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dahpe_tpu.cli.args import build_parser
    from dahpe_tpu.cli.train import main as train_main

    train_main(build_parser("train").parse_args(cli_args + ["--multihost"]))


if __name__ == "__main__":
    main()
