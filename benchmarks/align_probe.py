import os, time
import numpy as np
os.environ.setdefault("BENCH_ALIGN", "0")
from whisperx_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from whisperx_tpu.align.alignment import align, test_align_model, _batched_emissions
from whisperx_tpu.models.configs import WAV2VEC2_BASE

m = test_align_model("en", config=WAV2VEC2_BASE, dtype=jnp.bfloat16)
B = 8
rng = np.random.default_rng(0)
audio = (rng.standard_normal((B*480000,))*0.1).astype(np.float32)
words = ("the quick brown fox jumps over the lazy dog and runs far away "
         "while seven silent watchers record every single word spoken here ").split()
text = " " + " ".join(words*4)[:400]
transcript = [{"start": i*30.0+0.2, "end": (i+1)*30.0-0.2, "text": text} for i in range(B)]
meta = {"language": "en", "dictionary": m.dictionary, "type": "jax"}

# full align twice (first = compile)
for tag in ("compile", "run"):
    t0=time.perf_counter()
    align([dict(s) for s in transcript], m, meta, audio)
    print(f"align {tag}: {time.perf_counter()-t0:.3f}s")

# emissions only
slices = [audio[int(s['start']*16000):int(s['end']*16000)] for s in transcript]
t0=time.perf_counter(); em = _batched_emissions(m, slices); print(f"emissions(warm incl host xfer): {time.perf_counter()-t0:.3f}s")

# trellis+backtrack only
from whisperx_tpu.ops.ctc import align_tokens_batch
logp = np.stack([e[0] for e in em]); tl=[e[1] for e in em]
toks=[[m.dictionary[c] for c in "hello|world"*20] for _ in range(B)]
t0=time.perf_counter(); align_tokens_batch(logp, toks, tl, blank=0); print(f"ctc compile: {time.perf_counter()-t0:.3f}s")
t0=time.perf_counter(); align_tokens_batch(logp, toks, tl, blank=0); print(f"ctc warm: {time.perf_counter()-t0:.3f}s")

# pure device fwd time (no host transfer)
from whisperx_tpu.align.alignment import _emission_fwd
fwd=_emission_fwd(m.model)
wavs=np.zeros((8,480000),np.float32); lens=np.full((8,),479360,np.int32)
r=fwd(m.params, jnp.asarray(wavs), jnp.asarray(lens)); r.block_until_ready()
t0=time.perf_counter()
for _ in range(3):
    r=fwd(m.params, jnp.asarray(wavs), jnp.asarray(lens)); r.block_until_ready()
print(f"w2v fwd device-only: {(time.perf_counter()-t0)/3:.3f}s")
