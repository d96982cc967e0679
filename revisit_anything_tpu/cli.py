"""Command-line pipeline driver — the reference's stage scripts as one CLI.

    python -m revisit_anything_tpu.cli extract --dataset D --method SAM|DINO
        (= place_rec_SAM_DINO.py)
    python -m revisit_anything_tpu.cli vocab --dataset D --domain indoor
        (= vlad_c_centers_pt_gen.py)
    python -m revisit_anything_tpu.cli pca --dataset D --experiment E
        (= place_rec_pca.py)
    python -m revisit_anything_tpu.cli evaluate --dataset D --experiment E
        --vocab-vlad domain|map [--save-results]
        (= place_rec_main.py)

Stage artifacts (h5/pt/npz/pkl) live under --workdir with the reference's
filenames, so cached reference artifacts are directly consumable.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


def _add_common(p, dataset_required=True):
    p.add_argument("--dataset", required=dataset_required, default=None)
    p.add_argument("--workdir", default=os.environ.get("RAT_WORKDIR",
                                                       "./workdir"))
    p.add_argument("--data-root", default=os.environ.get("RAT_DATA_ROOT",
                                                         "./data"))


def cmd_extract(args):
    import jax
    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.datasets.images import list_dataset_images
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import (SAM_REGISTRY,
                                                 load_sam_checkpoint)
    from revisit_anything_tpu.pipeline import (extract_dino_features,
                                               extract_sam_masks)

    ds = get_dataset(args.dataset)
    refs, queries = list_dataset_images(ds, args.data_root)
    os.makedirs(args.workdir, exist_ok=True)
    if getattr(args, "multihost", False):
        # pod-scale extraction: one jax.distributed runtime per host, each
        # host owns a contiguous shard of the image lists (its h5 shards
        # are merged offline); local devices split each shard further via
        # the data mesh inside the extract functions
        from revisit_anything_tpu.parallel import (host_shard,
                                                   initialize_multihost)
        initialize_multihost()
        refs = refs[host_shard(len(refs))]
        queries = queries[host_shard(len(queries))]
        import jax as _jax
        print(f"multihost: process {_jax.process_index()}/"
              f"{_jax.process_count()}, {len(refs)} refs / "
              f"{len(queries)} queries on this host")
        # per-host shard files: hosts on a shared filesystem must not
        # clobber one identical h5 path; merge the .partN files offline
        shard_suffix = f".part{_jax.process_index()}"
    else:
        shard_suffix = ""
    sets = {"r": refs, "q": queries}

    def _skip(out_path):
        if os.path.exists(out_path) and not args.force:
            print(f"exists, skipping (use --force to redo): {out_path}")
            return True
        return False

    # params pack to one device buffer per model: per-leaf upload costs
    # ~0.3-1.5 s/buffer through a TPU tunnel (utils/packing.py)
    from revisit_anything_tpu.utils.packing import pack_host, packed_init
    if args.method == "SAM":
        cfg = SAM_REGISTRY[args.sam_variant]
        if args.checkpoint:
            params = pack_host(load_sam_checkpoint(args.checkpoint, cfg))
        else:
            from revisit_anything_tpu.models.sam import init_sam_params
            print("WARNING: no --checkpoint; using random SAM weights",
                  file=sys.stderr)
            params = packed_init(lambda k: init_sam_params(cfg, k),
                                 jax.random.PRNGKey(0))
        for tag, paths in sets.items():
            out = os.path.join(args.workdir,
                               (ds.masks_h5_ref if tag == "r"
                                else ds.masks_h5_query) + shard_suffix)
            keys = [os.path.basename(p) for p in paths]
            if _skip(out):
                continue
            extract_sam_masks(paths, keys, out, params, cfg,
                              ds.sam_size.hw)
            print(f"wrote {out}")
        from revisit_anything_tpu.utils.profiling import stage_timer
        print(stage_timer().report())
    elif args.method == "DINONV":
        # SegVLAD-FineT backbone extraction (place_rec_DINO_finetuned.py):
        # DINOv2-B + NetVLAD checkpoint, 768-d dense features, full res.
        from revisit_anything_tpu.pipeline.extract import (
            extract_dinonv_features_to_h5)
        from revisit_anything_tpu.training.vladbuff import (
            load_vladbuff_checkpoint)
        cfg = dn.VIT_B14
        if args.checkpoint:
            params = load_vladbuff_checkpoint(args.checkpoint, cfg)
        else:
            raise SystemExit("--method DINONV requires --checkpoint "
                             "(DnV2_NV/last.ckpt)")
        for tag, paths in sets.items():
            out = os.path.join(args.workdir,
                               (ds.dino_nv_h5_ref if tag == "r"
                                else ds.dino_nv_h5_query) + shard_suffix)
            keys = [os.path.basename(p) for p in paths]
            if _skip(out):
                continue
            extract_dinonv_features_to_h5(paths, keys, out, params, cfg,
                                          ds.size.hw)
            print(f"wrote {out}")
    elif args.method == "DINOSALAD":
        # DINO-SALAD backbone extraction (place_rec_DINO_finetuned.py
        # DINOSALAD branch): channel-normalized 768-d dense features.
        from revisit_anything_tpu.pipeline.extract import (
            extract_dinosalad_features_to_h5)
        from revisit_anything_tpu.training.vladbuff import (
            load_dinosalad_checkpoint)
        cfg = dn.VIT_B14
        if not args.checkpoint:
            raise SystemExit("--method DINOSALAD requires --checkpoint "
                             "(dino_salad.ckpt)")
        params = load_dinosalad_checkpoint(args.checkpoint, cfg)
        for tag, paths in sets.items():
            name = (ds.dino_nv_h5_ref if tag == "r"
                    else ds.dino_nv_h5_query).replace("dinoNV", "dinoSALAD")
            out = os.path.join(args.workdir, name + shard_suffix)
            keys = [os.path.basename(p) for p in paths]
            if _skip(out):
                continue
            extract_dinosalad_features_to_h5(paths, keys, out, params, cfg,
                                             ds.size.hw)
            print(f"wrote {out}")
    elif args.method == "DINOV1":
        # Legacy DINOv1 collection flow (DINO/collect_dino_features.py
        # :32-109): stride-patched ViT facet features at layer 11.
        from revisit_anything_tpu.models import dinov1 as d1
        from revisit_anything_tpu.pipeline.extract import (
            extract_dinov1_features_to_h5)
        cfg = d1.CONFIGS[args.dinov1_model]
        if args.checkpoint:
            params = pack_host(d1.load_checkpoint(args.checkpoint, cfg))
        else:
            print("WARNING: no --checkpoint; using random DINOv1 weights",
                  file=sys.stderr)
            params = packed_init(lambda k: dn.init_params(cfg, k),
                                 jax.random.PRNGKey(0))
        # None defaults = per-method fallback; an EXPLICIT --layer/--facet
        # always wins (value-based remapping would silently override
        # e.g. an intentional `--facet value`)
        layer = args.layer if args.layer is not None else 11
        facet = args.facet if args.facet is not None else "key"
        for tag, paths in sets.items():
            name = (ds.dino_h5_ref if tag == "r"
                    else ds.dino_h5_query).replace("dino", "dinoV1")
            out = os.path.join(args.workdir, name + shard_suffix)
            keys = [os.path.basename(p) for p in paths]
            if _skip(out):
                continue
            extract_dinov1_features_to_h5(
                paths, keys, out, params, cfg, ds.size.hw,
                stride=args.dino_stride, layer=layer, facet=facet,
                binned=args.dinov1_binned, upsample=args.dinov1_upsample)
            print(f"wrote {out}")
    elif args.method == "DINO":
        cfg = dn.CONFIGS[args.dino_model]
        if args.checkpoint:
            params = pack_host(dn.load_checkpoint(args.checkpoint, cfg))
        else:
            print("WARNING: no --checkpoint; using random DINO weights",
                  file=sys.stderr)
            params = packed_init(lambda k: dn.init_params(cfg, k),
                                 jax.random.PRNGKey(0))
        for tag, paths in sets.items():
            out = os.path.join(args.workdir,
                               (ds.dino_h5_ref if tag == "r"
                                else ds.dino_h5_query) + shard_suffix)
            keys = [os.path.basename(p) for p in paths]
            if _skip(out):
                continue
            extract_dino_features(
                paths, keys, out, params, cfg, ds.size.hw,
                layer=args.layer if args.layer is not None else 31,
                facet=args.facet if args.facet is not None else "value")
            print(f"wrote {out}")
    else:
        raise SystemExit(f"unknown method {args.method}")


def cmd_vocab(args):
    from revisit_anything_tpu.config import WorkdirConfig, get_dataset
    from revisit_anything_tpu.io.h5io import list_image_keys
    from revisit_anything_tpu.io.vocab import save_cluster_centers
    from revisit_anything_tpu.pipeline import fit_vocabulary_from_h5
    import h5py

    ds = get_dataset(args.dataset)
    dino_name = ds.dino_nv_h5_ref if args.finetuned else ds.dino_h5_ref
    dino_h5 = os.path.join(args.workdir, dino_name)
    with h5py.File(dino_h5, "r") as f:
        keys = list_image_keys(f)
    centers = fit_vocabulary_from_h5(dino_h5, keys,
                                     num_clusters=args.clusters)
    vocab_id = args.domain or ds.map_vlad_cluster
    out = WorkdirConfig(cache_root=args.cache_root).vocab_path(
        vocab_id, finetuned=args.finetuned)
    save_cluster_centers(out, centers)
    print(f"wrote {out} {centers.shape}")


def _load_banks(args, exp, ds, centers):
    import h5py
    from revisit_anything_tpu.io.h5io import list_image_keys
    from revisit_anything_tpu.pipeline import compute_segment_vlads

    finetuned = getattr(args, "finetuned", False)
    dino_r = ds.dino_nv_h5_ref if finetuned else ds.dino_h5_ref
    dino_q = ds.dino_nv_h5_query if finetuned else ds.dino_h5_query
    banks = {}
    for tag, masks_name, dino_name in (
            ("r", ds.masks_h5_ref, dino_r),
            ("q", ds.masks_h5_query, dino_q)):
        masks_h5 = os.path.join(args.workdir, masks_name)
        dino_h5 = os.path.join(args.workdir, dino_name)
        with h5py.File(dino_h5, "r") as f:
            keys = list_image_keys(f)
        banks[tag] = (compute_segment_vlads(
            masks_h5, dino_h5, keys, centers, exp.order,
            ds.sam_size.hw, ds.size.hw), keys)
    return banks


def _load_centers(args, ds):
    from revisit_anything_tpu.config import WorkdirConfig
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    vocab_id = ds.vocab_id(args.vocab_vlad)
    path = WorkdirConfig(cache_root=args.cache_root).vocab_path(
        vocab_id, finetuned=getattr(args, "finetuned", False))
    return load_cluster_centers(path)


def _pca_paths(args, exp):
    """(reference pkl path, our npz path) for the experiment's PCA model —
    ONE naming rule shared by cmd_pca and cmd_evaluate."""
    suffix = (exp.pca_model_pkl if args.vocab_vlad == "domain"
              else exp.pca_model_pkl_map) or f"_pca_order{exp.order}.pkl"
    pkl = os.path.join(args.workdir, f"{args.dataset}{suffix}")
    return pkl, pkl + ".npz"


def cmd_pca(args):
    from revisit_anything_tpu.config import get_dataset, get_experiment
    from revisit_anything_tpu.ops.pca import save_pca_npz
    from revisit_anything_tpu.pipeline import fit_pca_from_vlads

    ds = get_dataset(args.dataset)
    exp = get_experiment(args.experiment)
    centers = _load_centers(args, ds)
    banks = _load_banks(args, exp, ds, centers)
    params = fit_pca_from_vlads(banks["r"][0], num_components=args.dim)
    _, out = _pca_paths(args, exp)
    save_pca_npz(out, params)
    print(f"wrote {out}")


def cmd_evaluate(args):
    from revisit_anything_tpu.utils.profiling import trace
    with trace(args.trace_dir):
        _cmd_evaluate(args)


def _cmd_evaluate(args):
    from revisit_anything_tpu.config import get_dataset, get_experiment
    from revisit_anything_tpu.datasets import get_gt
    from revisit_anything_tpu.datasets.images import list_dataset_images
    from revisit_anything_tpu.ops.pca import (load_pca_npz,
                                              load_sklearn_pca_pickle)
    from revisit_anything_tpu.pipeline import (run_anyloc_retrieval,
                                               run_segloc_retrieval)
    from revisit_anything_tpu.pipeline.aggregate import global_vlads_from_h5
    from revisit_anything_tpu.utils.profiling import stage_timer

    ds = get_dataset(args.dataset)
    exp = get_experiment(args.experiment)
    centers = _load_centers(args, ds)

    try:
        refs, queries = list_dataset_images(ds, args.data_root)
    except FileNotFoundError:
        refs = queries = None
    gt = get_gt(args.dataset, args.data_root, refs, queries)

    if exp.global_method == "AnyLoc":
        import h5py
        # gt check BEFORE the heavy aggregation: all-empty gt would only
        # produce meaningless all-zero recalls after minutes of compute
        if gt is None:
            raise SystemExit("gt unavailable; cannot evaluate")
        from revisit_anything_tpu.io.h5io import list_image_keys
        names = {}
        for tag, dino_name in (("r", ds.dino_h5_ref),
                               ("q", ds.dino_h5_query)):
            path = os.path.join(args.workdir, dino_name)
            with h5py.File(path, "r") as f:
                names[tag] = (path, list_image_keys(f))
        db_v = global_vlads_from_h5(*names["r"], centers, ds.size.hw)
        q_v = global_vlads_from_h5(*names["q"], centers, ds.size.hw)
        res = run_anyloc_retrieval(db_v, q_v, gt)
    else:
        if gt is None:
            raise SystemExit("gt unavailable; cannot evaluate (recalls "
                             "against fabricated empty gt would read as "
                             "an all-zero regression)")
        banks = _load_banks(args, exp, ds, centers)
        pca = _load_pca(args, exp) if exp.pca else None
        res = run_segloc_retrieval(banks["r"][0], banks["q"][0], gt, pca=pca)

    print("Recall@1..5:", res.recalls)
    if res.one_percent_recall is not None:
        print("1%-recall:", res.one_percent_recall)
    print(stage_timer().report())
    if args.save_results:
        out_dir = os.path.join(args.workdir, "results", "global",
                               f"{args.experiment}_{args.dataset}")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "results.pkl"), "wb") as f:
            payload = {"recalls": res.recalls, "sims": res.sims,
                       "matches": res.matches,
                       "predictions": res.predictions}
            if args.save_descriptors and exp.global_method == "SegLoc":
                # the reference's segFtVLAD1/2 pickles (place_rec_main.py
                # :292-305,:357-370)
                payload["segFtVLAD1"] = banks["r"][0].descriptors
                payload["segFtVLAD2"] = banks["q"][0].descriptors
                payload["imInds1"] = banks["r"][0].image_indices
                payload["imInds2"] = banks["q"][0].image_indices
            pickle.dump(payload, f)
        with open(os.path.join(out_dir, "recalls.json"), "w") as f:
            json.dump({"recalls": res.recalls}, f)
        print(f"results saved to {out_dir}")


def cmd_train(args):
    """VPR metric-learning training (the VLAD-BuFF train.py equivalent):
    GSV-Cities-style places → DINOv2 backbone + NetVLAD-AntiBurst →
    MultiSimilarity loss, AdamW, orbax checkpoints."""
    import jax
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.training import (VPRTrainConfig,
                                               create_train_state,
                                               train_step)
    from revisit_anything_tpu.training.checkpoint import (
        latest_checkpoint, restore_train_state, save_best_state,
        save_train_state)
    from revisit_anything_tpu.training.validation import (ValidationSet,
                                                          run_validation)
    from revisit_anything_tpu.training.data import (PlacesBatcher,
                                                    discover_places,
                                                    prefetch)

    backbone = dn.CONFIGS[args.backbone]
    if (args.lr_sched == "multistep" and args.steps_per_epoch == 0
            and max(args.milestones) < 1000):
        # Per-BATCH stepping matches the reference: VPRModel overrides
        # optimizer_step and calls self.lr_schedulers().step() every
        # batch (VLAD-BuFF/vpr_model.py:230-233), bypassing Lightning's
        # per-epoch default for [opt],[sched] returns.
        print("WARNING: multistep milestones are in STEPS (the reference "
              "steps its scheduler per batch — vpr_model.py:233 overrides "
              "optimizer_step); "
              f"milestones {args.milestones} will decay the LR within the "
              "first steps — set --steps-per-epoch to use epoch units",
              file=sys.stderr)
    cfg = VPRTrainConfig(backbone=backbone,
                         num_trainable_blocks=args.num_trainable_blocks,
                         clusters=args.clusters,
                         antiburst=not args.no_antiburst,
                         lr=args.lr, total_steps=args.steps,
                         warmup_steps=max(1, args.steps // 20),
                         imgs_per_place=args.img_per_place,
                         optimizer=args.optimizer,
                         lr_sched=args.lr_sched,
                         milestones=tuple(args.milestones),
                         gamma=args.gamma, momentum=args.momentum,
                         steps_per_epoch=args.steps_per_epoch,
                         cosine_t_max=args.cosine_t_max)
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed))
    params, opt_state, step = state.params, state.opt_state, state.step

    ckpt = latest_checkpoint(args.ckpt_dir)
    if ckpt and args.resume:
        params, opt_state, step0 = restore_train_state(ckpt, params,
                                                       opt_state)
        step = step + step0
        print(f"resumed from {ckpt} at step {step0}")

    if os.path.isdir(os.path.join(args.train_root, "Dataframes")):
        # GSV-Cities as DISTRIBUTED: per-city DataFrame CSVs + flat
        # Images/ folders (GSVCitiesDataset.py:57-100) — no conversion
        # step needed.
        from revisit_anything_tpu.training.data import discover_places_gsv
        places = discover_places_gsv(
            args.train_root, cities=args.cities or None,
            min_img_per_place=args.img_per_place)
    else:
        places = discover_places(args.train_root,
                                 min_images=args.img_per_place)
    print(f"{len(places)} places")
    batcher = PlacesBatcher(places, image_hw=tuple(args.image_size),
                            places_per_batch=args.batch_places,
                            img_per_place=args.img_per_place,
                            seed=args.seed)

    val_set = None
    if args.val_root:
        val_set = ValidationSet.from_directory(
            args.val_root, image_hw=tuple(args.image_size))
        print(f"validation set {val_set.name}: {len(val_set.ref_paths)} "
              f"refs / {len(val_set.query_paths)} queries")

    def maybe_validate(s):
        """Held-out recalls every --val-every steps; best-R1 checkpoint
        retention (the pitts30k_val/R1 monitor, VLAD-BuFF
        train.py:383-392)."""
        if val_set is None:
            return
        recalls = run_validation(params, cfg, val_set)
        if args.log_file:
            with open(args.log_file, "a") as lf:
                lf.write(json.dumps(
                    {"step": s, **{f"{val_set.name}/R{k}": v
                                   for k, v in recalls.items()}}) + "\n")
        best = save_best_state(args.ckpt_dir, params, opt_state, s,
                               recalls[1], f"{val_set.name}/R1")
        if best:
            print(f"best checkpoint ({val_set.name}/R1="
                  f"{recalls[1]:.4f}): {best}")

    done = False
    while not done:
        for images, labels in prefetch(iter(batcher)):
            params, opt_state, step, loss = train_step(
                params, opt_state, step, cfg, images, labels)
            s = int(step)
            if s % args.log_every == 0:
                print(f"step {s}: loss {float(loss):.4f}", flush=True)
                if args.log_file:
                    with open(args.log_file, "a") as lf:
                        lf.write(json.dumps({"step": s,
                                             "loss": float(loss)}) + "\n")
            if val_set is not None and (s % args.val_every == 0
                                        or s >= args.steps):
                maybe_validate(s)
            if s % args.ckpt_every == 0 or s >= args.steps:
                path = save_train_state(args.ckpt_dir, params, opt_state, s)
                print(f"checkpoint: {path}")
            if s >= args.steps:
                done = True
                break


def cmd_add_pca(args):
    """Bake whitened PCA into a VLAD-BuFF checkpoint (the add_pca.py
    flow, add_pca.py:389-600): extract global descriptors over a sample
    image set, eig-PCA fit, save wpca{n}-augmented param trees."""
    import glob as globmod

    import jax.numpy as jnp
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.pipeline.extract import (_resize_cv2_bilinear,
                                                       load_image_rgb)
    from revisit_anything_tpu.training.vladbuff import (
        fit_wpca, global_descriptor, load_vladbuff_checkpoint,
        load_vladbuff_params, save_vladbuff_params)

    cfg = dn.CONFIGS[args.backbone]
    params = (load_vladbuff_params(args.checkpoint)
              if args.checkpoint.endswith(".npy")
              else load_vladbuff_checkpoint(args.checkpoint, cfg))
    params.pop("wpca", None)      # fit on the raw descriptor space

    paths = sorted(globmod.glob(os.path.join(args.images_root, "**", "*"),
                                recursive=True))
    paths = [p for p in paths
             if p.lower().endswith((".jpg", ".jpeg", ".png"))]
    paths = paths[:args.num_samples]
    if not paths:
        raise SystemExit(f"no images under {args.images_root}")
    descs = []
    hw = tuple(args.image_size)
    for s in range(0, len(paths), args.batch_size):
        imgs = np.stack([
            _resize_cv2_bilinear(load_image_rgb(p), (hw[1], hw[0]))
            for p in paths[s:s + args.batch_size]])
        x = dn.preprocess(imgs)
        descs.append(np.asarray(global_descriptor(params, cfg,
                                                  jnp.asarray(x))))
    descs = np.concatenate(descs)
    print(f"fitted on {len(descs)} descriptors of dim {descs.shape[1]}")

    # fit ONCE at the largest num_pcs and slice per n (the reference
    # eigendecomposes once and takes current_u = u[:, :n] per output,
    # add_pca.py:546-578) — each component's whitening scale is its own
    # eigenvalue, so slicing the max-k W/b rows is exact
    wpca_full = fit_wpca(jnp.asarray(descs), max(args.num_pcs))
    for n in sorted(args.num_pcs):
        baked = dict(params)
        baked["wpca"] = {"w": wpca_full["w"][:n], "b": wpca_full["b"][:n]}
        out = args.out_template.format(n=n)
        save_vladbuff_params(out, baked)
        print(f"wpca{n}: {out}")


def cmd_evaluate_global(args):
    """Whole-image descriptor benchmark (the VLAD-BuFF eval.py equivalent):
    VLAD-BuFF / DINO-SALAD global descriptors + validation recalls."""
    import jax.numpy as jnp
    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.datasets import get_gt
    from revisit_anything_tpu.datasets.images import list_dataset_images
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.pipeline.extract import (_resize_cv2_bilinear,
                                                       load_image_rgb)
    from revisit_anything_tpu.retrieval.analysis import (
        get_validation_recalls)
    from revisit_anything_tpu.training.vladbuff import (
        global_descriptor, load_dinosalad_checkpoint,
        load_vladbuff_checkpoint, salad_global_descriptor)

    if getattr(args, "benchmark", None):
        # VLAD-BuFF eval.py benchmark sets (npy image lists + gt,
        # datasets/vladbuff_val.py)
        from revisit_anything_tpu.datasets.vladbuff_val import (
            load_msls_val, load_vladbuff_val)
        vs = (load_msls_val(args.gt_root) if args.benchmark == "msls_val"
              else load_vladbuff_val(args.benchmark, args.gt_root))
        refs = [os.path.join(args.data_root, p) for p in vs.db_images]
        queries = [os.path.join(args.data_root, p) for p in vs.q_images]
        gt = vs.ground_truth
        if gt is None:
            raise SystemExit(f"{args.benchmark} has no public ground truth")
        hw = tuple(args.image_size)
        ds = None
    else:
        if not args.dataset:
            raise SystemExit("evaluate-global needs --dataset or "
                             "--benchmark")
        ds = get_dataset(args.dataset)
        refs, queries = list_dataset_images(ds, args.data_root)
        gt = get_gt(args.dataset, args.data_root, refs, queries)
        hw = ds.size.hw
        if gt is None:
            raise SystemExit("no ground truth for this dataset")

    if args.model == "vladbuff":
        params = load_vladbuff_checkpoint(args.checkpoint, dn.VIT_B14)
        desc_fn = global_descriptor
    else:
        params = load_dinosalad_checkpoint(args.checkpoint, dn.VIT_B14)
        desc_fn = salad_global_descriptor

    def descriptors(paths):
        out = []
        for s in range(0, len(paths), args.batch_size):
            imgs = np.stack([
                _resize_cv2_bilinear(load_image_rgb(p), (hw[1], hw[0]))
                for p in paths[s:s + args.batch_size]])
            x = dn.preprocess(imgs)
            out.append(np.asarray(desc_fn(params, dn.VIT_B14,
                                          jnp.asarray(x))))
        return np.concatenate(out)

    db = descriptors(refs)
    q = descriptors(queries)
    get_validation_recalls(db, q, gt,
                           dataset_name=getattr(args, "benchmark", None)
                           or args.dataset)


def _points_per_batch(args) -> int:
    """Resolve --points-per-batch per backend. On TPU the whole 1024-point
    grid decodes in ONE dispatch through the fused Pallas tail (round-4
    measured optimum). Other backends fall back to XLA paths that
    materialize per-prompt [B, 4096, 256] intermediates (~4 GiB f32 at
    B=1024), so they default to the reference GPU batch of 64
    (automatic_mask_generator.py:62)."""
    if args.points_per_batch is not None:
        return args.points_per_batch
    import jax
    return 1024 if jax.default_backend() == "tpu" else 64


def cmd_amg(args):
    """Standalone automatic mask generation over an image or directory —
    the reference's sam/scripts/amg.py CLI: per image, one output folder
    with <i>.png binary masks and a metadata.csv of the record fields."""
    import jax
    from revisit_anything_tpu.models.sam import (SAM_REGISTRY,
                                                 init_sam_params,
                                                 load_sam_checkpoint)
    from revisit_anything_tpu.models.sam.amg import AmgConfig, generate_masks
    from revisit_anything_tpu.pipeline.extract import load_image_rgb

    cfg = SAM_REGISTRY[args.model_type]
    if args.checkpoint:
        params = load_sam_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no --checkpoint; using random SAM weights",
              file=sys.stderr)
        params = init_sam_params(cfg, jax.random.PRNGKey(0))
    amg = AmgConfig(
        points_per_side=args.points_per_side,
        points_per_batch=_points_per_batch(args),
        pred_iou_thresh=args.pred_iou_thresh,
        stability_score_thresh=args.stability_score_thresh,
        box_nms_thresh=args.box_nms_thresh,
        crop_n_layers=args.crop_n_layers,
        crop_nms_thresh=args.crop_nms_thresh,
        min_mask_region_area=args.min_mask_region_area)

    if os.path.isdir(args.input):
        targets = [os.path.join(args.input, f)
                   for f in sorted(os.listdir(args.input))
                   if os.path.isfile(os.path.join(args.input, f))]
    else:
        targets = [args.input]
    os.makedirs(args.output, exist_ok=True)

    from PIL import Image
    header = ("id,area,bbox_x0,bbox_y0,bbox_w,bbox_h,point_input_x,"
              "point_input_y,predicted_iou,stability_score,crop_box_x0,"
              "crop_box_y0,crop_box_w,crop_box_h")
    for t in targets:
        try:
            image = load_image_rgb(t)
        except Exception:
            print(f"Could not load '{t}' as an image, skipping...")
            continue
        print(f"Processing '{t}'...")
        records = generate_masks(params, cfg, image, amg)
        base = os.path.splitext(os.path.basename(t))[0]
        out = os.path.join(args.output, base)
        os.makedirs(out, exist_ok=True)
        rows = [header]
        for i, r in enumerate(records):
            Image.fromarray((r.segmentation * 255).astype(np.uint8)).save(
                os.path.join(out, f"{i}.png"))
            cb = r.crop_box
            rows.append(",".join(map(str, [
                i, r.area, *r.bbox,
                float(r.point_coords[0, 0]), float(r.point_coords[0, 1]),
                r.predicted_iou, r.stability_score,
                cb[0], cb[1], cb[2], cb[3]])))    # crop_box is XYWH
        with open(os.path.join(out, "metadata.csv"), "w") as f:
            f.write("\n".join(rows))
        print(f"{len(records)} masks -> {out}")


def _load_pca(args, exp):
    """ONE npz-else-sklearn-pickle resolution for evaluate and
    build-index."""
    from revisit_anything_tpu.ops.pca import (load_pca_npz,
                                              load_sklearn_pca_pickle)
    pkl, npz = _pca_paths(args, exp)
    return (load_pca_npz(npz) if os.path.exists(npz)
            else load_sklearn_pca_pickle(pkl))


def cmd_build_index(args):
    """Build a serving index: PCA-projected, row-normalized database
    segment descriptors + image ids + the vocabulary/PCA parameters, in
    one npz consumed by `query`."""
    from revisit_anything_tpu.config import get_dataset, get_experiment
    from revisit_anything_tpu.ops.pca import load_pca_npz, load_sklearn_pca_pickle
    from revisit_anything_tpu.pipeline.evaluate import (_normalize_rows,
                                                        apply_pca_in_batches)

    ds = get_dataset(args.dataset)
    exp = get_experiment(args.experiment)
    centers = _load_centers(args, ds)
    banks = _load_banks(args, exp, ds, centers)
    bank = banks["r"][0]
    pca = _load_pca(args, exp)
    db = _normalize_rows(apply_pca_in_batches(bank, pca).descriptors)
    np.savez_compressed(
        args.output,
        db=db.astype(np.float32),
        db_dtype=np.asarray(args.db_dtype),
        db_image_ids=bank.image_indices,
        image_keys=np.asarray(banks["r"][1]),
        centers=centers,
        pca_mean=np.asarray(pca.mean),
        pca_components=np.asarray(pca.components),
        pca_variance=np.asarray(pca.explained_variance),
        pca_whiten=np.asarray(bool(pca.whiten)),
        order=np.asarray(exp.order),
        mask_h=np.asarray(ds.sam_size.height),
        mask_w=np.asarray(ds.sam_size.width),
        dino_h=np.asarray(ds.size.height),
        dino_w=np.asarray(ds.size.width))
    print(f"wrote {args.output}: {db.shape[0]} segments / "
          f"{int(bank.image_indices.max()) + 1} images")


def _build_server(args, db_capacity=None):
    """SegVLADServer from a build-index npz + model flags (shared by the
    one-shot ``query`` and the persistent ``serve`` commands). Returns
    (server, image_keys, dino_hw)."""
    import jax
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import (SAM_REGISTRY,
                                                 init_sam_params,
                                                 load_sam_checkpoint)
    from revisit_anything_tpu.models.sam.amg import AmgConfig
    from revisit_anything_tpu.pipeline.serve import (SegVLADServer,
                                                     ServingIndex)

    z = np.load(args.index)
    index = ServingIndex.from_npz(z)       # single read of the npz
    sam_cfg = SAM_REGISTRY[args.sam_variant]
    dino_cfg = dn.CONFIGS[args.dino_model]
    if args.layer >= dino_cfg.depth:
        raise SystemExit(f"--layer {args.layer} out of range for "
                         f"{args.dino_model} (depth {dino_cfg.depth})")
    # pack to one device buffer per model: per-leaf upload/materialization
    # dominates serving warmup (~0.3-1.5 s per buffer through a TPU
    # tunnel; utils/packing.py)
    from revisit_anything_tpu.utils.packing import pack_host, packed_init
    sam_params = (pack_host(load_sam_checkpoint(args.sam_checkpoint,
                                                sam_cfg))
                  if args.sam_checkpoint
                  else packed_init(
                      lambda k: init_sam_params(sam_cfg, k),
                      jax.random.PRNGKey(0)))
    dino_params = (pack_host(dn.load_checkpoint(args.dino_checkpoint,
                                                dino_cfg))
                   if args.dino_checkpoint
                   else packed_init(
                       lambda k: dn.init_params(dino_cfg, k),
                       jax.random.PRNGKey(1)))

    dino_hw = (int(z["dino_h"]), int(z["dino_w"]))
    mask_hw = (int(z["mask_h"]), int(z["mask_w"]))
    amg = AmgConfig(points_per_side=args.points_per_side,
                    points_per_batch=_points_per_batch(args),
                    pred_iou_thresh=args.pred_iou_thresh,
                    stability_score_thresh=args.stability_score_thresh)
    server = SegVLADServer(
        sam_params=sam_params, sam_cfg=sam_cfg,
        dino_params=dino_params, dino_cfg=dino_cfg, index=index,
        full_hw=dino_hw, sam_hw=mask_hw, dino_layer=args.layer,
        top_images=args.topk, amg=amg, db_capacity=db_capacity)
    return server, [str(k) for k in z["image_keys"]], dino_hw


def _load_query_image(path, dino_hw):
    from revisit_anything_tpu.pipeline.extract import (_resize_cv2_bilinear,
                                                       load_image_rgb)
    img = load_image_rgb(path)
    if img.shape[:2] != dino_hw:
        img = _resize_cv2_bilinear(img, (dino_hw[1], dino_hw[0]))
    return img


def _top_json(path, top, keys):
    # unfilled ranks are -1 (the query matched fewer distinct database
    # images than --topk) — report only real matches
    top = top[top >= 0]
    return json.dumps({"query": path,
                       "matches": [keys[i] if i < len(keys)
                                   else f"image_{int(i)}" for i in top],
                       "image_ids": top.tolist()})


def cmd_query(args):
    """Online query: one image against a prebuilt index through the
    serving pipeline (pipeline/serve.py — single uint8 upload, device-
    resident masks, fused retrieval tail)."""
    server, keys, dino_hw = _build_server(args)
    top = server.query(_load_query_image(args.image, dino_hw))
    print(_top_json(args.image, top, keys))


def cmd_serve(args):
    """Persistent query loop: model init + compiles are paid ONCE, then
    stdin commands drive the live server (one JSON line per result):

      query <image-path>     → top-k image ids/keys
      add <image-path>       → extract + insert as a new db image
                               (needs --db-capacity)
      remove <image-id>      → drop an image from retrieval
      snapshot <out.npz>     → persist the live index
      quit                   → exit

    The reference has no serving story (filesystem-staged batch scripts
    only); this is the deployment surface of the incremental index."""
    server, keys, dino_hw = _build_server(args,
                                          db_capacity=args.db_capacity)
    print(json.dumps({"ready": True, "images": server.num_images,
                      "hw": list(dino_hw)}), flush=True)
    stream = args._stdin if hasattr(args, "_stdin") else sys.stdin
    for line in stream:
        parts = line.strip().split(None, 1)
        if not parts:
            continue
        cmd, arg = parts[0].lower(), (parts[1] if len(parts) > 1 else "")
        try:
            if cmd == "quit":
                break
            elif cmd == "query":
                top = server.query(_load_query_image(arg, dino_hw))
                print(_top_json(arg, top, keys), flush=True)
            elif cmd == "add":
                (new_id,) = server.add_reference_images(
                    [_load_query_image(arg, dino_hw)])
                while len(keys) < new_id:
                    keys.append(f"image_{len(keys)}")
                keys.append(arg)
                print(json.dumps({"added": arg, "image_id": new_id}),
                      flush=True)
            elif cmd == "remove":
                server.remove_reference_image(int(arg))
                print(json.dumps({"removed": int(arg)}), flush=True)
            elif cmd == "snapshot":
                server.snapshot_index(arg, image_keys=keys)
                print(json.dumps({"snapshot": arg}), flush=True)
            else:
                print(json.dumps({"error": f"unknown command {cmd!r}"}),
                      flush=True)
        except Exception as e:  # keep serving: report, don't die
            print(json.dumps({"error": str(e), "command": cmd}),
                  flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="revisit_anything_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("extract", help="SAM masks / DINO features → h5")
    _add_common(p)
    p.add_argument("--method", required=True,
                   choices=["SAM", "DINO", "DINOV1", "DINONV",
                            "DINOSALAD"])
    p.add_argument("--force", action="store_true",
                   help="regenerate artifacts even if they exist")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--sam-variant", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"])
    p.add_argument("--dino-model", default="dinov2_vitg14",
                   choices=["dinov2_vitg14", "dinov2_vitl14",
                            "dinov2_vitb14", "dinov2_vits14"])
    p.add_argument("--layer", type=int, default=None,
                   help="facet layer (default: 31 for DINO, 11 for "
                        "DINOV1)")
    p.add_argument("--facet", default=None,
                   help="q/k/v/token facet (default: value for DINO, "
                        "key for DINOV1)")
    p.add_argument("--dinov1-model", default="dino_vits8",
                   choices=["dino_vits8", "dino_vits16", "dino_vitb8",
                            "dino_vitb16"])
    p.add_argument("--dino-stride", type=int, default=4,
                   help="DINOV1 patch-embed stride override "
                        "(dino_wrapper.py dino_strides)")
    p.add_argument("--dinov1-binned", action="store_true",
                   help="GSP log-binned descriptors")
    p.add_argument("--dinov1-upsample",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="bilinear align_corners upsample to dataset "
                        "resolution — the reference wrapper hard-codes "
                        "upsample=True (DINO/dino_wrapper.py); "
                        "--no-dinov1-upsample keeps the strided grid")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and shard images per host")
    p.set_defaults(func=cmd_extract)

    p = sub.add_parser("vocab", help="fit VLAD vocabulary (cosine kmeans)")
    _add_common(p)
    p.add_argument("--finetuned", action="store_true",
                   help="fit on dinoNV features (NVFinetuned vocab id)")
    p.add_argument("--clusters", type=int, default=32)
    p.add_argument("--domain", default=None)
    p.add_argument("--cache-root", default="./cache")
    p.set_defaults(func=cmd_vocab)

    p = sub.add_parser("pca", help="fit whitened PCA on ref segment VLADs")
    _add_common(p)
    p.add_argument("--experiment", required=True)
    p.add_argument("--finetuned", action="store_true")
    p.add_argument("--vocab-vlad", default="domain",
                   choices=["domain", "map"])
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--cache-root", default="./cache")
    p.set_defaults(func=cmd_pca)

    p = sub.add_parser("evaluate", help="retrieval + Recall@K")
    _add_common(p)
    p.add_argument("--experiment", required=True)
    p.add_argument("--finetuned", action="store_true",
                   help="SegVLAD-FineT path: dinoNV h5s + NVFinetuned vocab")
    p.add_argument("--vocab-vlad", default="domain",
                   choices=["domain", "map"])
    p.add_argument("--save-results", action="store_true")
    p.add_argument("--cache-root", default="./cache")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of the evaluation")
    p.add_argument("--save-descriptors", action="store_true",
                   help="include segment descriptors in results.pkl "
                        "(the reference's segFtVLAD pickles)")
    p.set_defaults(func=cmd_evaluate)

    p = sub.add_parser("amg", help="standalone automatic mask generation "
                                   "(the sam/scripts/amg.py CLI)")
    p.add_argument("--input", required=True,
                   help="image file or directory")
    p.add_argument("--output", required=True)
    p.add_argument("--model-type", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--points-per-batch", type=int, default=None,
                   help="prompts per decode dispatch (default: 1024 on "
                        "TPU, 64 elsewhere — the XLA fallback holds "
                        "~4 MiB/prompt of intermediates)")
    p.add_argument("--pred-iou-thresh", type=float, default=0.88)
    p.add_argument("--stability-score-thresh", type=float, default=0.95)
    p.add_argument("--box-nms-thresh", type=float, default=0.7)
    p.add_argument("--crop-n-layers", type=int, default=0)
    p.add_argument("--crop-nms-thresh", type=float, default=0.7)
    p.add_argument("--min-mask-region-area", type=int, default=0)
    p.set_defaults(func=cmd_amg)

    p = sub.add_parser("build-index", help="build a serving index npz from "
                                           "the reference-side artifacts")
    _add_common(p)
    p.add_argument("--experiment", required=True)
    p.add_argument("--vocab-vlad", default="domain",
                   choices=["domain", "map"])
    p.add_argument("--finetuned", action="store_true")
    p.add_argument("--cache-root", default="./cache")
    p.add_argument("--output", required=True)
    p.add_argument("--db-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="device storage dtype for the database rows; "
                        "bfloat16 halves serving HBM (kNN still "
                        "accumulates f32)")
    p.set_defaults(func=cmd_build_index)

    p = sub.add_parser("query", help="online query: one image vs a "
                                     "prebuilt index (fused device path)")
    p.add_argument("--index", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--sam-variant", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"])
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--dino-model", default="dinov2_vitg14",
                   choices=["dinov2_vitg14", "dinov2_vitl14",
                            "dinov2_vitb14", "dinov2_vits14"])
    p.add_argument("--dino-checkpoint", default=None)
    p.add_argument("--layer", type=int, default=31)
    # AMG knobs (reference SamAutomaticMaskGenerator defaults,
    # automatic_mask_generator.py:35-87)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--points-per-batch", type=int, default=None,
                   help="prompts per decode dispatch (default: 1024 on "
                        "TPU, 64 elsewhere — the XLA fallback holds "
                        "~4 MiB/prompt of intermediates)")
    p.add_argument("--pred-iou-thresh", type=float, default=0.88)
    p.add_argument("--stability-score-thresh", type=float, default=0.95)
    p.set_defaults(func=cmd_query)

    p = sub.add_parser("serve", help="persistent query/insert loop over "
                                     "stdin (one JSON line per result)")
    p.add_argument("--index", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--sam-variant", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"])
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--dino-model", default="dinov2_vitg14",
                   choices=["dinov2_vitg14", "dinov2_vitl14",
                            "dinov2_vitb14", "dinov2_vits14"])
    p.add_argument("--dino-checkpoint", default=None)
    p.add_argument("--layer", type=int, default=31)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--points-per-batch", type=int, default=None,
                   help="prompts per decode dispatch (default: 1024 on "
                        "TPU, 64 elsewhere — the XLA fallback holds "
                        "~4 MiB/prompt of intermediates)")
    p.add_argument("--pred-iou-thresh", type=float, default=0.88)
    p.add_argument("--stability-score-thresh", type=float, default=0.95)
    p.add_argument("--db-capacity", type=int, default=None,
                   help="static row capacity enabling live add/remove/"
                        "snapshot (pipeline/serve.py incremental mode)")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser("train", help="VPR metric-learning training "
                                     "(VLAD-BuFF train.py equivalent)")
    p.add_argument("--cities", nargs="*", default=None,
                   help="GSV-Cities shipped format: restrict to these "
                        "Dataframes/<City>.csv (default: all)")
    p.add_argument("--train-root", required=True,
                   help="city/place_id/image directory layout")
    p.add_argument("--ckpt-dir", default="./ckpts")
    p.add_argument("--backbone", default="dinov2_vitb14",
                   choices=list(__import__(
                       "revisit_anything_tpu.models.dinov2",
                       fromlist=["CONFIGS"]).CONFIGS))
    p.add_argument("--num-trainable-blocks", type=int, default=4)
    p.add_argument("--clusters", type=int, default=64)
    p.add_argument("--no-antiburst", action="store_true")
    p.add_argument("--lr", type=float, default=6e-5)
    p.add_argument("--optimizer", default="adamw",
                   choices=["sgd", "adam", "adamw"])
    p.add_argument("--lr-sched", default="linear",
                   choices=["linear", "multistep", "cosine"])
    p.add_argument("--milestones", type=int, nargs="+", default=[5, 10, 15])
    p.add_argument("--gamma", type=float, default=0.3)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="multistep milestone unit (0: milestones are "
                        "raw steps)")
    p.add_argument("--cosine-t-max", type=int, default=0)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch-places", type=int, default=16)
    p.add_argument("--img-per-place", type=int, default=4)
    p.add_argument("--image-size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--log-file", default=None,
                   help="append JSONL {step, loss} records (the wandb-"
                        "equivalent metric stream; no egress here)")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--val-root", default=None,
                   help="validation dir: ref/ query/ gt.npy — enables "
                        "in-training recalls + best-R1 checkpointing")
    p.add_argument("--val-every", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("add-pca", help="bake whitened PCA into a "
                       "VLAD-BuFF checkpoint (add_pca.py flow)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--backbone", default="dinov2_vitb14")
    p.add_argument("--images-root", required=True)
    p.add_argument("--num-pcs", type=int, nargs="+", default=[8192])
    p.add_argument("--num-samples", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--out-template", default="wpca{n}_last.npy")
    p.set_defaults(func=cmd_add_pca)

    p = sub.add_parser("evaluate-global",
                       help="whole-image descriptor recalls "
                            "(VLAD-BuFF eval.py equivalent)")
    _add_common(p, dataset_required=False)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="vladbuff",
                   choices=["vladbuff", "dinosalad"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--benchmark", default=None,
                   help="VLAD-BuFF benchmark set (nordland, sped, "
                        "amstertime, st_lucia, tokyo247, sfsm, "
                        "pitts30k_*, msls_val) instead of --dataset")
    p.add_argument("--gt-root", default=None,
                   help="npy ground-truth root (defaults to the "
                        "reference VLAD-BuFF/datasets when mounted)")
    p.add_argument("--image-size", type=int, nargs=2,
                   default=[224, 224])
    p.set_defaults(func=cmd_evaluate_global)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
