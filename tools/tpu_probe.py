"""Retrying TPU probe: measures warm pipeline throughput despite tunnel flakiness."""
import os, subprocess, sys, time

INNER = r'''
import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
tick("importing jax")
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax
tick(f"init {jax.devices()}")
from zstd_tpu import pipeline
from tests.conftest import gen_text
comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=32)
data = gen_text(256*1024, 0)
b = comp.compress(data); tick(f"256KB -> {len(b)}")
t0=time.time(); comp.compress(data); tick(f"256KB warm {0.25/(time.time()-t0):.2f} MB/s")
data4 = gen_text(4*1024*1024, 1)
b = comp.compress(data4); tick(f"4MB first -> {len(b)}")
t0=time.time(); comp.compress(data4); dt=time.time()-t0
tick(f"4MB warm {4/dt:.2f} MB/s")
'''

for attempt in range(5):
    print(f"--- attempt {attempt} ---", flush=True)
    p = subprocess.Popen([sys.executable, "-u", "-c", INNER],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    last = time.time()
    import threading
    done = False
    def watchdog():
        while not done and p.poll() is None:
            if time.time() - last > 150:
                p.kill(); return
            time.sleep(2)
    threading.Thread(target=watchdog, daemon=True).start()
    for line in p.stdout:
        print(line, end="", flush=True)
        last = time.time()
    p.wait()
    done = True
    if p.returncode == 0:
        break
    time.sleep(5)
