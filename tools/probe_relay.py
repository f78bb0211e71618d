"""Tiny relay-health probe: prints one line per attempt, retries forever."""
import subprocess, sys, time
CODE = ("import time,jax,jax.numpy as jnp;"
        "t0=time.time();x=jnp.ones((1024,1024),jnp.bfloat16);"
        "v=float(jax.jit(lambda a:(a@a).sum())(x));"
        "print('OK %.1fs val=%g'%(time.time()-t0,v),flush=True)")
deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 6000
n = 0
while time.time() < deadline:
    n += 1
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-u", "-c", CODE],
                           capture_output=True, text=True, timeout=1500)
        out = (r.stdout or "").strip().splitlines()
        ok = [l for l in out if l.startswith("OK")]
        if ok and r.returncode == 0:
            print(f"[probe {n}] HEALTHY: {ok[-1]}", flush=True)
            sys.exit(0)
        print(f"[probe {n}] exit={r.returncode} in {time.time()-t0:.0f}s "
              f"out={out[-1] if out else ''} err={(r.stderr or '').strip().splitlines()[-1:]}: ", flush=True)
    except subprocess.TimeoutExpired:
        print(f"[probe {n}] HUNG (420s)", flush=True)
    time.sleep(60)
print("deadline reached, relay never healthy", flush=True)
sys.exit(1)
