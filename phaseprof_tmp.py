import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax, jax.numpy as jnp
from monte_carlo_localization_tpu.mapping import random_obstacle_world
from monte_carlo_localization_tpu.models.sensor import SensorModel
from monte_carlo_localization_tpu.models.motion import motion_model
from monte_carlo_localization_tpu.ops.raycast import cast_rays_lut
from monte_carlo_localization_tpu.ops.resample import systematic_resample_indices

N, R = 4000, 1080
gm = random_obstacle_world(height=768, width=768, num_obstacles=64, seed=0).with_range_lut(1440)
sensor = SensorModel.create(max_range_px=gm.max_range_px, resolution=gm.resolution)
beams = jnp.asarray(np.linspace(-2.35,2.35,R), jnp.float32)
key = jax.random.key(0)
particles = jax.random.uniform(key, (N,3), jnp.float32, 5.0, 20.0)
logw = jnp.zeros(N)
scan = jnp.full((R,), 5.0)

def tm(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

# phase: query build + raycast
@jax.jit
def raycast_phase(particles):
    qx = jnp.broadcast_to(particles[:, 0:1], (N, R))
    qy = jnp.broadcast_to(particles[:, 1:2], (N, R))
    qa = particles[:, 2:3] + beams[None, :]
    q = jnp.stack([qx.reshape(-1), qy.reshape(-1), qa.reshape(-1)], axis=1)
    return cast_rays_lut(gm, q)
print("raycast(lut) phase: %.2f ms" % tm(raycast_phase, particles))

ranges = raycast_phase(particles).reshape(N, R)
@jax.jit
def sensor_phase(ranges):
    return sensor.log_likelihood(scan, ranges, mode="analytic")
print("sensor analytic phase: %.2f ms" % tm(sensor_phase, ranges))

@jax.jit
def resample_phase(key, logw, particles):
    idx = systematic_resample_indices(key, logw)
    return particles[idx]
print("resample phase: %.2f ms" % tm(resample_phase, key, logw, particles))

@jax.jit
def motion_phase(key, particles):
    return motion_model(key, particles, jnp.asarray([0.05,0.,0.01]))
print("motion phase: %.2f ms" % tm(motion_phase, key, particles))

# raycast WITHOUT query stack (indices computed fused)
@jax.jit
def raycast_fused(particles):
    res = gm.resolution; h, w, t = gm.height, gm.width, gm.lut_theta_bins
    gx = ((particles[:,0]-gm.origin_x)/res).astype(jnp.int32)
    gy = ((particles[:,1]-gm.origin_y)/res).astype(jnp.int32)
    oob = (gx<0)|(gx>=w)|(gy<0)|(gy>=h)
    cell = (jnp.clip(gy,0,h-1)*w + jnp.clip(gx,0,w-1))
    ang = particles[:,2:3] + beams[None,:]
    b = jnp.round(ang*(t/(2*jnp.pi))).astype(jnp.int32) % t
    b = jnp.where(b<0, b+t, b)
    idx = cell[:,None]*t + b
    px = gm.range_lut[idx.reshape(-1)].astype(jnp.float32)
    return px
print("raycast fused idx: %.2f ms" % tm(raycast_fused, particles))
