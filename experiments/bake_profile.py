"""Where does the DF bake time go? Run ON TPU."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from libclsph_tpu.scene.scene import Scene
from libclsph_tpu.ops import collisions as C

name = sys.argv[1] if len(sys.argv) > 1 else "labyrinth.obj"
thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.116
s = Scene.load(name, thr, scenes_dir="scenes")
print(f"{name}: faces={s.face_count} gridpoints={s.total_gridpoints}", file=sys.stderr)
t0 = time.perf_counter()
df = C.bake_distance_field(s)
df_sum = float(jnp.sum(df))
t1 = time.perf_counter()
print(f"bake total: {t1-t0:.1f}s (digest {df_sum:.3f})")
t0 = time.perf_counter()
df = C.bake_distance_field(s)
float(jnp.sum(df))
t1 = time.perf_counter()
print(f"bake again (warm jit): {t1-t0:.1f}s")
