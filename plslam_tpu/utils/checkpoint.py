"""Map checkpoint / resume.

The reference has NO map persistence (a long-acknowledged ORB-SLAM2 gap —
every run starts from scratch; SURVEY §5 lists checkpoint/resume as an aux
subsystem to supply). Here the whole world model serializes to one ``.npz``:
arena arrays verbatim, observation dicts as (id, kf, feat) triples, and the
keyframe feature snapshots stacked per field — including descriptors pulled
back from the device arenas (the host mirrors are zeros for tracker-created
landmarks by design; see models.map).

Typical uses: save after a mapping session, reload with
``System(..., localization_only=True)`` and relocalize against the stored
keyframe database (the reference's intended localization mode without its
"must keep the process alive" constraint).
"""

from __future__ import annotations

import numpy as np

from ..models.frame import FrameData
from ..models.map import HostFrame, SlamMap

_PT_FIELDS = ("pt_pos", "pt_normal", "pt_min_dist", "pt_max_dist",
              "pt_valid", "pt_first_kf", "pt_visible", "pt_found")
_LN_FIELDS = ("ln_ep", "ln_valid", "ln_first_kf", "ln_visible", "ln_found",
              "ln_normal", "ln_min_dist", "ln_max_dist")
_KF_FIELDS = ("kf_R", "kf_t", "kf_valid", "kf_frame_id", "kf_timestamp",
              "kf_pt_idx", "kf_ln_idx", "kf_parent",
              "kf_cull_parent", "kf_cull_Rcp", "kf_cull_tcp")


def _obs_triples(obs_list, n):
    rows = []
    for i in range(n):
        for kf, feat in obs_list[i].items():
            rows.append((i, kf, feat))
    return np.array(rows, np.int64).reshape(-1, 3)


def save_map(m: SlamMap, path: str):
    """Serialize a SlamMap (device descriptor arenas fetched once)."""
    import jax

    data: dict[str, np.ndarray] = {}
    for f in _PT_FIELDS + _LN_FIELDS + _KF_FIELDS:
        data[f] = np.asarray(getattr(m, f))
    data["n_kf"] = np.int64(m.n_kf)
    data["pt_next"] = np.int64(m._pt_next)
    data["ln_next"] = np.int64(m._ln_next)
    data["big_change_idx"] = np.int64(m.big_change_idx)
    # authoritative descriptors live on device
    data["pt_desc"] = np.asarray(jax.device_get(m.point_desc_arena()))
    data["ln_desc"] = np.asarray(jax.device_get(m.line_desc_arena()))
    data["pt_obs"] = _obs_triples(m.pt_obs, m._pt_next)
    data["ln_obs"] = _obs_triples(m.ln_obs, m._ln_next)
    data["loop_edges"] = np.array(m.loop_edges, np.int64).reshape(-1, 2)
    # keyframe feature snapshots (device copy preferred: the wire-built host
    # snapshots zero-fill device-only fields)
    kfs = [k for k in range(m.n_kf) if m.kf_valid[k]]
    data["kf_rows"] = np.array(kfs, np.int64)
    for field in FrameData._fields:
        stack = []
        for k in kfs:
            fd = m.kf_frames_dev[k]
            src = (np.asarray(jax.device_get(getattr(fd, field)))
                   if fd is not None else getattr(m.kf_frames[k], field))
            stack.append(src)
        if stack:
            data[f"fd_{field}"] = np.stack(stack)
    np.savez_compressed(path, **data)


def load_map(cfg, path: str) -> SlamMap:
    """Rebuild a SlamMap from save_map output."""
    z = np.load(path)
    m = SlamMap(cfg)
    for f in _PT_FIELDS + _LN_FIELDS + _KF_FIELDS:
        if f in z:  # tolerate checkpoints from before a field existed
            getattr(m, f)[:] = z[f]
    m.n_kf = int(z["n_kf"])
    m._pt_next = int(z["pt_next"])
    m._ln_next = int(z["ln_next"])
    m.big_change_idx = int(z["big_change_idx"])
    m.pt_desc[:] = z["pt_desc"]
    m.ln_desc[:] = z["ln_desc"]
    # device arenas re-upload lazily from the now-complete host mirrors
    import jax.numpy as jnp

    m._pt_desc_dev = jnp.asarray(m.pt_desc)
    m._ln_desc_dev = jnp.asarray(m.ln_desc)
    if "loop_edges" in z:
        m.loop_edges = [(int(a), int(b)) for a, b in z["loop_edges"]]
    for i, kf, feat in z["pt_obs"]:
        m.pt_obs[i][int(kf)] = int(feat)
    for i, kf, feat in z["ln_obs"]:
        m.ln_obs[i][int(kf)] = int(feat)
    for k in range(m.n_kf):
        m.kf_children[k] = set()
    for k in range(m.n_kf):
        p = int(m.kf_parent[k])
        if p >= 0:
            m.kf_children[p].add(k)
    kfs = z["kf_rows"]
    for row, k in enumerate(kfs):
        fd = FrameData(*(z[f"fd_{f}"][row] for f in FrameData._fields))
        m.kf_frames[int(k)] = HostFrame(fd)
    return m


def register_keyframes(system):
    """Re-register loaded keyframes with the BoW database so
    relocalization / loop detection work against the restored map."""
    import numpy as np

    m = system.map
    for k in range(m.n_kf):
        if not m.kf_valid[k]:
            continue
        fd = m.device_frame(k)
        _, bow = system.voc.transform(fd.kp_desc, fd.kp_valid)
        system.kfdb.add(k, np.asarray(bow))
