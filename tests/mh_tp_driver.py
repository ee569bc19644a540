"""Two-process DP x TP driver (run as a subprocess by test_multihost.py).

Builds a data=2 x model=2 mesh whose MODEL axis crosses the process
boundary (make_mesh(model_across_processes=True)), shards the train state
per train_state_shardings (row-sharded embeddings + fused LSTM weights),
and runs N deterministic train steps, printing ``iter i: loss x`` lines.
Run with JAX_NUM_PROCESSES=2 + coordinator env for the multihost case, or
standalone with 4 virtual devices for the single-process reference — the
printed losses must agree (the TP all-gathers/reduce-scatters then provably
survive a process boundary, which the reference's NCCL DP-only design never
exercises, reference distributed.py:132-179).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def put(x, sharding):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))

    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu.parallel import mesh as PM
    from tacotron2_subword_tpu import train_lib as T

    cfg = create_config({
        "n_symbols": 24, "sub_n_symbols": 32, "symbols_embedding_dim": 16,
        "encoder_embedding_dim": 16, "bert_embedding_dim": 12,
        "attention_rnn_dim": 20, "attention_dim": 8, "decoder_rnn_dim": 24,
        "prenet_dim": 10, "n_mel_channels": 5, "postnet_embedding_dim": 16,
        "attention_location_n_filters": 4,
        "attention_location_kernel_size": 7, "parity_mode": True,
    })
    mesh = PM.make_mesh(n_model=2, model_across_processes=True)
    assert mesh.shape == {"data": 2, "model": 2}
    if jax.process_count() > 1:
        # each model-axis pair must span both processes
        procs = {d.process_index for d in mesh.devices[0]}
        assert procs == {0, 1}, f"model axis does not cross hosts: {procs}"
        PM.collective_barrier(mesh)

    state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    shardings = PM.train_state_shardings(state, mesh)
    sstate = jax.tree_util.tree_map(put, state, shardings)
    step_fn = PM.make_parallel_train_step(cfg, tx, mesh, state=state)

    B, T_text, T_sub, T_out = 4, 8, 6, 8
    rng = np.random.RandomState(0)
    batch_np = {
        "text": rng.randint(0, cfg.n_symbols, (B, T_text)).astype(np.int32),
        "text_lengths": np.full((B,), T_text, np.int32),
        "sub": rng.randint(0, cfg.sub_n_symbols, (B, T_sub)).astype(np.int32),
        "sub_lengths": np.full((B,), T_sub, np.int32),
        "mels": rng.randn(B, cfg.n_mel_channels, T_out).astype(np.float32),
        "output_lengths": np.full((B,), T_out, np.int32),
        "cls_phone": rng.randn(B, cfg.bert_embedding_dim).astype(np.float32),
        "cls_sub": rng.randn(B, cfg.bert_embedding_dim).astype(np.float32),
    }
    batch_np["gate_target"] = np.asarray(
        T.make_gate_target(batch_np["output_lengths"], T_out))
    data = PM.batch_sharding(mesh)
    rep = PM.replicate_sharding(mesh)
    batch = {k: put(v, data) for k, v in batch_np.items()}

    for i in range(steps):
        key = put(np.asarray(jax.random.PRNGKey(100 + i)), rep)
        sstate, metrics = step_fn(sstate, batch, key)
        print(f"iter {i}: loss {float(metrics['total']):.8f}", flush=True)


if __name__ == "__main__":
    main()
