"""Probe the axon TPU tunnel in a loop; write status to /tmp/tpu_status.txt.

Run as a background process. Each attempt spawns a subprocess (so a hung
device init can't wedge this script) that tries jax.devices() with a
timeout. Writes 'UP <timestamp>' on success and exits; otherwise keeps
probing every 120 s, writing 'DOWN <timestamp> attempt=N'.
"""
import subprocess
import sys
import time

PROBE = "import jax; d = jax.devices(); print('DEVS', d)"
STATUS = "/tmp/tpu_status.txt"


def main() -> None:
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE],
                capture_output=True, text=True, timeout=240,
            )
            if out.returncode == 0 and "DEVS" in out.stdout:
                with open(STATUS, "w") as f:
                    f.write(f"UP {time.strftime('%H:%M:%S')} {out.stdout.strip()}\n")
                print("tunnel UP", flush=True)
                return
            msg = (out.stderr or out.stdout).strip().splitlines()
            tail = msg[-1] if msg else "no output"
        except subprocess.TimeoutExpired:
            tail = "timeout 240s"
        with open(STATUS, "w") as f:
            f.write(f"DOWN {time.strftime('%H:%M:%S')} attempt={attempt} {tail}\n")
        print(f"attempt {attempt}: DOWN ({tail})", flush=True)
        time.sleep(120)


if __name__ == "__main__":
    main()
