import time, numpy as np, jax, jax.numpy as jnp
t00=time.time()
def log(msg): print(f'[{time.time()-t00:6.1f}s] {msg}', flush=True)
from cet_pick_tpu.config import Config
from cet_pick_tpu.models.detector import create_detector
from cet_pick_tpu.train.state import create_train_state
from cet_pick_tpu.infer.detector import TomoDetector
from cet_pick_tpu.ops.decode import tomo_decode

D,H,W = 256,512,512
cfg = Config(task='semi', arch='unet_4', K=900, nms=3, dtype='bfloat16').finalize()
model = create_detector(cfg)
state = create_train_state(model, cfg, jax.random.PRNGKey(0), np.zeros((1,8,64,64),np.float32))
det = TomoDetector(cfg, params=state.params, batch_stats=state.batch_stats, tile_z=64)
rng = np.random.default_rng(0)
vol = rng.standard_normal((D,H,W)).astype(np.float32)
log('setup done')
dv = jax.device_put(vol); _=np.asarray(dv[0,0,0]); log('vol on device')
hm = det.infer(dv); log('infer dispatched')
_ = np.asarray(hm[0,:2,:2]); log('hm materialized (infer done)')
dd = tomo_decode(hm, kernel=3, k=900); log('decode dispatched')
out = np.asarray(dd); log('decode fetched')
dd2 = tomo_decode(hm, kernel=3, k=900); out2 = np.asarray(dd2); log('decode rep2')
hm2 = det.infer(dv); dd3 = tomo_decode(hm2, kernel=3, k=900); out3=np.asarray(dd3); log('full rep (dev vol)')
