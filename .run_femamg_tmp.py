import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

for inner in ("fem-amg",):
    cfg = Config(mesh="kershaw", shape=(16, 16, 16), poly_degree=7,
                 poly_reduction=6, inner=inner, max_iterations=100,
                 checkpoint="/root/repo/.ckpt_cache")
    t0 = time.time()
    rec = run_simulation(cfg)
    print(f"=== inner={inner}: iterations={rec['iterations']} "
          f"converged={rec['converged']} solve={rec['solve_seconds']:.3f}s "
          f"total={time.time()-t0:.0f}s", flush=True)
