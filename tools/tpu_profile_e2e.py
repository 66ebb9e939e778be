import sys, time, cProfile, pstats
sys.path.insert(0, ".")
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax
from zstd_tpu import pipeline
from tests.conftest import gen_text
data = gen_text(8*1024*1024, 1)
comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=8)
comp.compress(data)  # warm
pr = cProfile.Profile(); pr.enable()
t0=time.time(); comp.compress(data); dt=time.time()-t0
pr.disable()
print(f"8MB warm {8/dt:.2f} MB/s", flush=True)
st = pstats.Stats(pr); st.sort_stats("cumulative"); st.print_stats(16)
