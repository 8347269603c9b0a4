import os, sys, json, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
def log(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
import time; T0=time.time()

root = tempfile.mkdtemp(prefix="openviic_e2e_")
caps = ["một người đàn ông đang đi bộ trên đường",
        "hai đứa trẻ chơi bóng đá trên sân cỏ",
        "một con mèo nằm trên ghế sofa"]
def split(name, ids):
    json.dump({"images":[{"id":i,"file_name":f"{i}.jpg"} for i in ids],
               "annotations":[{"image_id":i,"caption":caps[i%3]} for i in ids for _ in range(2)]},
              open(f"{root}/{name}.json","w"))
split("train",[0,1,2,3]); split("dev",[4,5]); split("test",[6,7])
os.makedirs(f"{root}/feats", exist_ok=True)
_rng = np.random.default_rng(0)
for i in range(8):
    np.save(f"{root}/feats/{i}.npy",
            {"region_features": _rng.normal(size=(int(_rng.integers(4,9)),1024)).astype(np.float32),
             "region_boxes": _rng.uniform(0,1,(5,4)).astype(np.float32)}, allow_pickle=True)
from openviic_tpu.config import ConfigNode
from openviic_tpu.data import Vocab, FeatureDataset
from openviic_tpu.data.loader import DataLoader
from openviic_tpu.builders import build_model
from openviic_tpu.decoding import beam_search
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
log(f"imports done; devices={jax.devices()}")

ds_cfg = ConfigNode({"FEATURE_BATCH_SIZE":4,"DICT_BATCH_SIZE":4,"WORKERS":0,"MIN_FREQ":1,
  "VOCAB":{"TOKENIZER":None,"WORD_EMBEDDING":None,"WORD_EMBEDDING_CACHE":None,
           "BOS_TOKEN":"<bos>","EOS_TOKEN":"<eos>","PAD_TOKEN":"<pad>","UNK_TOKEN":"<unk>",
           "USE_MAPPING":False,"PRETRAINED_LANGUAGE_MODEL":None},
  "JSON_PATH":{"TRAIN":f"{root}/train.json","DEV":f"{root}/dev.json","TEST":f"{root}/test.json"},
  "FEATURE_PATH":{"FEATURES":f"{root}/feats","SCENE_TEXT":None,"IMAGE":None}})
vocab = Vocab(ds_cfg)
log(f"vocab size={len(vocab)} max_len={vocab.max_caption_length}")

train = FeatureDataset(f"{root}/train.json", vocab, ds_cfg)
loader = DataLoader(train, batch_size=4, shuffle=True, seed=0)
batch = next(iter(loader))
log(f"batch keys={sorted(batch.arrays().keys())} rf={batch['region_features'].shape}")

from tests.helpers import model_config
cfg = model_config(d_feature=1024)
model = build_model(cfg, vocab)
import jax.numpy as jnp
jb = {k: jnp.asarray(v) for k,v in batch.arrays().items()}
log("starting model.init")
params = model.init(jax.random.PRNGKey(0), jb)
log("init done; starting forward")
out = model.apply(params, jb)
out.block_until_ready()
log(f"teacher-forced out {out.shape} on {list(out.devices())[0]}")

bsfn = jax.jit(lambda p,b: beam_search(model,p,b,beam_size=5,out_size=1))
log("starting beam search compile+run")
outs, lps = bsfn(params, jb)
outs.block_until_ready()
log("beam search first run done")
t1=time.time()
outs2, _ = bsfn(params, jb); outs2.block_until_ready()
log(f"cached run {time.time()-t1:.3f}s")
print("decoded:", vocab.decode_caption(np.asarray(outs)), flush=True)
