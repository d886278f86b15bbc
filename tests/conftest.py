"""Test config: run on a virtual 8-device CPU mesh regardless of real hardware.

The session environment registers the axon TPU PJRT plugin in *every* Python
process via a sitecustomize hook (PYTHONPATH=/root/.axon_site) and routes XLA
compiles through a remote-compile tunnel — which makes even trivial CPU jits
take ~60s. Tests must be fast and hardware-independent, so if we detect the
hook we re-exec pytest once with a sanitized environment before any jax
import.
"""

import os
import sys

_AXON_MARKERS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE")


def _sanitized_env():
    env = dict(os.environ)
    pypath = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(pypath)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["_TAIR_TPU_TEST_REEXEC"] = "1"
    return env


if (
    any(m in os.environ for m in _AXON_MARKERS)
    and "_TAIR_TPU_TEST_REEXEC" not in os.environ
):
    import subprocess

    # The parent pytest has already fd-captured stdout, so the child's
    # stream may be invisible in this process's output; tee it to a log.
    log_path = os.path.join("/tmp", f"pytest_child.{os.getpid()}.log")
    proc = subprocess.Popen(
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env=_sanitized_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    with open(log_path, "wb") as log:
        for line in proc.stdout:
            log.write(line)
            try:
                os.write(1, line)
            except OSError:
                pass
    os._exit(proc.wait())

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
