"""End-to-end drive: CARS (flagship) train -> eval -> beam suggest -> resume.

Follows .claude/skills/verify/SKILL.md. CPU, tiny shapes. Also drives an
E=300 (GloVe-dim) config so the round-2 lane-padded embedding path is
exercised through the full public API.
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import tempfile
from pathlib import Path

from context_attentive_ir_tpu.config import default_config, RunConfig
from context_attentive_ir_tpu.data import (
    build_dictionary, load_data, write_fixture)
from context_attentive_ir_tpu.train.trainer import Trainer

tmp = Path(tempfile.mkdtemp(prefix="drive_cars_"))
fix = tmp / "sessions.jsonl"
write_fixture(fix, n_sessions=48, n_candidates=8, seed=3)
sessions = load_data(fix, max_query_len=8, max_doc_len=12,
                     max_session_len=3, num_candidates=8)
train, dev = sessions[:40], sessions[40:]
word_dict = build_dictionary(
    [q.tokens for s in train for q in s.queries]
    + [d.tokens for s in train for q in s.queries for d in q.documents])

# E=300: unaligned GloVe dim -> lane-padded lookup path (round 2)
cfg = default_config("cars").replace(
    vocab_size=len(word_dict), emsize=300, nhid=16, nhid_ffnn=32,
    max_query_len=8, max_doc_len=12, max_session_len=3, num_candidates=8,
    learning_rate=2e-3)
run = RunConfig(model_dir=str(tmp / "model"), num_epochs=4, batch_size=8,
                beam_size=3)
trainer = Trainer(cfg, run, word_dict, use_mesh=True)
out = trainer.fit(train, dev)
hist = out["history"]
losses = [h["train_loss"] for h in hist]
print("train_loss:", [round(v, 4) for v in losses])
assert losses[-1] < losses[0], "loss did not decrease"
res = trainer.test(dev)
print("test:", {k: round(v, 4) for k, v in res.items()
                if isinstance(v, float)})
assert "map" in res and "bleu-1" in res, f"missing metric columns: {res}"

# resume probe
run2 = RunConfig(model_dir=str(tmp / "model"), num_epochs=6, batch_size=8,
                 beam_size=3, resume=True)
tr2 = Trainer(cfg, run2, word_dict, use_mesh=True)
hist2 = tr2.fit(train, dev)["history"]
assert hist2[0]["epoch"] == 4, f"resume did not continue: {hist2[0]}"
print("resume OK at epoch", hist2[0]["epoch"])

# serving probe (beam suggest + rank through the public engine)
from context_attentive_ir_tpu.serve import Engine
eng = Engine.from_checkpoint(Path(run.model_dir) / "model.mdl", beam_size=3)
scores = eng.rank("apple fruit sweet", ["apple pie recipe", "orange cat"],
                  history=["healthy food"])
print("rank scores:", [round(s, 3) for s in scores])
assert len(scores) == 2
sugg = eng.suggest(["healthy food", "apple fruit"])
print("suggest:", sugg[:2])
assert sugg and isinstance(sugg[0][0], str)
print("DRIVE OK")
