"""True multi-process distribution test (VERDICT r4 item 5).

The in-process 8-device mesh tests (test_parallel.py, the dryrun) validate
shardings but never the actual `jax.distributed` handshake. Here TWO real
processes (4 virtual CPU devices each) bootstrap a global 8-device view via
`parallel.distributed.initialize`, feed process-local batch rows, run a
sharded beam decode whose collectives cross the process boundary, and must
reproduce the single-process transcripts exactly. The reference has no
distributed layer at all (SURVEY §2c: no torch.distributed/NCCL anywhere).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_decode_matches_single_process():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    by_pid = {o["process_index"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["local_devices"] == 4
        assert o["global_devices"] == 8
    # local_batch_slice covers the global batch disjointly
    assert by_pid[0]["local_slice"] == [0, 4]
    assert by_pid[1]["local_slice"] == [4, 8]
    # shard_files round-robin partition
    assert by_pid[0]["my_files"] == ["f0.wav", "f2.wav", "f4.wav"]
    assert by_pid[1]["my_files"] == ["f1.wav", "f3.wav"]
    # Both processes gathered the SAME global token grid
    assert by_pid[0]["tokens"] == by_pid[1]["tokens"]

    # Single-process oracle: same model seed, same mel rng, same options.
    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    engine = WhisperEngine(model, WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en"))
    opts = engine.build_options(beam_size=2, max_new_tokens=6)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((8, 80, 3000)).astype(np.float32) * 0.5
    base = engine.generate(params, mel, options=opts)
    assert np.asarray(base.tokens).tolist() == by_pid[0]["tokens"]
