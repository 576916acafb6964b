"""Probe the tunneled-TPU session grant WITHOUT kill-mid-claim risk.

Run in a FRESH process with sitecustomize's pool registration skipped:

    env -u PALLAS_AXON_POOL_IPS AXON_POOL_SVC_OVERRIDE=127.0.0.1 \
        AXON_LOOPBACK_RELAY=1 python scripts/probe_tpu_grant.py

Healthy grant: prints GRANT_OK within ~1 min.  Dead grant: the register
call returns a clean `UNAVAILABLE: TPU backend setup/compile error`
after a deterministic ~25 min (the 120 s claim timeout is NOT honored
by the claim leg, but the error return is) and we print GRANT_DEAD.
Never SIGKILL this process mid-claim — that is exactly the pattern that
loses the grant for hours (see CLAUDE.md, environment gotchas).
"""
import sys
import time
import uuid


def main() -> int:
    t0 = time.time()
    try:
        import axon.register
        axon.register.register(
            None, "v5e:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=True,
            claim_timeout_s=120,
        )
        import jax
        jax.config.update("jax_platforms", "axon")
        import jax.numpy as jnp
        x = float(jnp.sum(jnp.ones((8, 8), jnp.float32)))
        assert x == 64.0, x
    except Exception as e:  # noqa: BLE001 - report, don't raise
        print(f"GRANT_DEAD after {time.time() - t0:.0f}s: {type(e).__name__}: {e}")
        return 1
    print(f"GRANT_OK in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
