"""Worker for the 2-process jax.distributed multihost test.

Launched by tests/test_multihost_2proc.py as:
  python tests/multihost_worker.py <coord_addr> <num_procs> <proc_id> <outdir>

Each process initializes the distributed runtime on the CPU backend, the
leader builds a TickPlan, broadcasts it, every process applies it to an
identically-seeded batcher (greedy), and dumps its emitted codes + device
slot state. The test asserts the dumps match bit-for-bit — proving followers
mirror the leader's device program from the plan bytes alone (SURVEY hard
part 7: every host enters the same pjit program each tick).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main(coord, nprocs, pid, outdir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)

    from fish_speech_tpu.engine.scheduler import ContinuousBatcher, SlotRequest
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from fish_speech_tpu.serve.multihost import (
        SlotAssignment, TickPlan, apply_plan, broadcast_plan)

    IM_END = 4
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, IM_END)
    batcher = ContinuousBatcher(params, cfg, num_slots=2, cache_len=64,
                                im_end_id=IM_END, bias=bias, greedy=True,
                                prompt_bucket=16, seed=3)

    plan = None
    if pid == 0:  # only the leader knows the requests
        rng = np.random.default_rng(7)
        k1 = cfg.num_codebooks + 1

        def prompt(t):
            p = rng.integers(0, 100, size=(k1, t)).astype(np.int32)
            p[1:] = rng.integers(0, cfg.codebook_size,
                                 size=(cfg.num_codebooks, t))
            return p

        reqs = [SlotRequest(request_id=i, prompt=prompt(6 + i),
                            max_new_tokens=8) for i in range(2)]
        plan = TickPlan(assignments=[
            SlotAssignment(slot=i, request_id=r.request_id, prompt=r.prompt,
                           max_new_tokens=r.max_new_tokens, temperature=0.7,
                           top_p=0.7) for i, r in enumerate(reqs)],
            n_ticks=8)

    plan = broadcast_plan(plan)
    registry = {}
    apply_plan(batcher, plan, registry)

    dump = {
        "cur": np.asarray(batcher.cur),
        "pos": np.asarray(batcher.pos),
        "active": np.asarray(batcher.active),
        "prev_win": np.asarray(batcher.prev_win),
    }
    for rid, req in registry.items():
        if req.result:
            dump[f"result_{rid}"] = np.stack(req.result, axis=1)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **dump)
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
