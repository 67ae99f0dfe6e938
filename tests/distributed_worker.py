"""Worker program for the true multi-process distribution test.

Launched by tests/test_distributed.py as N coordinated processes (each with 4
virtual CPU devices via XLA_FLAGS). Exercises the ONLY code path the
in-process 8-device mesh tests cannot: `parallel.distributed.initialize`
(real jax.distributed handshake), `local_batch_slice` feeding of
process-local rows into a global array, `shard_files`, and a sharded beam
decode whose collectives cross process boundaries.

Prints one JSON line with the decoded token grid so the parent can assert
equality with the single-process result. The reference has no distributed
layer at all (SURVEY §2c) — this is first-party capability.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from whisperx_tpu.parallel.distributed import (  # noqa: E402
    initialize,
    local_batch_slice,
    process_info,
    shard_files,
)


def main() -> None:
    initialize()  # from COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env
    info = process_info()

    from jax.experimental import multihost_utils

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params
    from whisperx_tpu.parallel import data_sharding, make_mesh, shard_params

    # Identical model on every process (same seed → same pytree).
    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(model, tokenizer)
    opts = engine.build_options(beam_size=2, max_new_tokens=6)

    mesh = make_mesh()  # (data=global devices, model=1)
    sharded_params = shard_params(params, mesh)

    # Global batch: every process computes the same host batch, then feeds
    # ONLY its local_batch_slice rows — the data-parallel contract.
    B = 8
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((B, 80, 3000)).astype(np.float32) * 0.5
    local_rows = mel[local_batch_slice(B)]
    global_mel = jax.make_array_from_process_local_data(
        data_sharding(mesh), local_rows, global_shape=mel.shape
    )

    with jax.set_mesh(mesh):
        # sync=False: the result holds global (non-fully-addressable) device
        # arrays; gather them explicitly below.
        result = engine.generate(sharded_params, global_mel, options=opts, sync=False)
    tokens = np.asarray(
        multihost_utils.process_allgather(result.tokens, tiled=True)
    )

    files = [f"f{i}.wav" for i in range(5)]
    print(
        json.dumps(
            {
                "process_index": info["process_index"],
                "process_count": info["process_count"],
                "local_devices": info["local_devices"],
                "global_devices": info["global_devices"],
                "local_slice": [local_batch_slice(B).start, local_batch_slice(B).stop],
                "my_files": shard_files(files),
                "tokens": tokens.tolist(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
