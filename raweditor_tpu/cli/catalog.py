"""Catalog-side subcommands: import / list / rate / sidecar / collect / edit / preset / verify / tiers."""

from __future__ import annotations

import json


from raweditor_tpu.params import EditParams
from raweditor_tpu.cli._shared import (_open_library,
                                        _params_from_args)


def cmd_import(args) -> int:
    from raweditor_tpu.pipeline.tiers import (process_pending_cache,
                                              watch_folder)

    with _open_library(args) as lib:
        if getattr(args, "watch", False):
            totals = watch_folder(
                lib, args.folder, cache_dir=args.cache_dir,
                interval=args.interval, tiers=not args.no_tiers,
                on_cycle=lambda s: print(json.dumps(s), flush=True),
            )
            print(json.dumps(totals))
            return 0
        stats = lib.import_folder(args.folder)
        out = {"imported": stats["imported"], "duplicates": stats["skipped"]}
        if getattr(args, "sidecars", False):
            out["sidecars_applied"] = _apply_sidecars(lib)["applied"]
        if not args.no_tiers:
            out.update(process_pending_cache(lib, args.cache_dir))
        print(json.dumps(out))
    return 0


def _apply_sidecars(lib, ids=None, force=False) -> dict:
    """Apply .xmp sidecars found next to catalog RAWs: edits (unless
    the image already has catalog edits and ``force`` is off — the
    catalog is the primary store; a stale sidecar must not clobber
    newer in-catalog work) and rating/flag (always — they're cheap to
    re-rate and third-party tools routinely update them)."""
    from raweditor_tpu.xmp import find_sidecar, read_sidecar

    images = (lib.get_all_images() if ids is None
              else [lib.get_image(i) for i in ids])
    applied, skipped, errors = 0, 0, []
    for img in images:
        if img is None or img.is_deleted():
            continue
        sc = find_sidecar(img.path)
        if sc is None:
            continue
        try:
            params, rating, flag, _label = read_sidecar(sc)
        except (ValueError, OSError) as e:
            errors.append({"path": sc, "error": str(e)})
            continue
        if not params.is_unedited():
            if lib.has_edits(img.id) and not force:
                skipped += 1
            else:
                lib.save_edit_params(img.id, params)
        if rating is not None or flag != "none":
            lib.set_rating(img.id, rating=rating,
                           flag=flag if flag != "none" else None)
        applied += 1
    return {"applied": applied, "skipped_edits": skipped,
            "errors": errors}


def cmd_sidecar(args) -> int:
    from raweditor_tpu.xmp import write_sidecar

    with _open_library(args) as lib:
        ids = args.ids or None
        if args.action == "apply":
            out = _apply_sidecars(lib, ids=ids, force=args.force)
            print(json.dumps(out))
            return 1 if out["errors"] else 0
        images = (lib.get_all_images() if ids is None
                  else [lib.get_image(i) for i in ids])
        written = []
        for img in images:
            if img is None or img.is_deleted():
                continue
            rating, flag = lib.get_rating(img.id)
            path = write_sidecar(
                img.path, lib.load_edit_params(img.id),
                rating=rating if (rating or flag != "none") else None,
                flag=flag)
            written.append(path)
        print(json.dumps({"written": len(written),
                          "paths": written}))
    return 0


def cmd_list(args) -> int:
    with _open_library(args) as lib:
        lib.verify_files()
        min_rating = getattr(args, "min_rating", 0) or 0
        flag = getattr(args, "flag", None)
        collection = getattr(args, "collection", None)
        search = getattr(args, "search", None)
        if min_rating or flag or collection or search:
            images = lib.filter_images(min_rating=min_rating, flag=flag,
                                       collection=collection,
                                       search=search)
        else:
            images = lib.get_all_images()
        for img in images:
            edited = "*" if lib.has_edits(img.id) else " "
            status = "deleted" if img.is_deleted() else (
                "cached" if img.cache_path_working else "pending")
            rating, rflag = lib.get_rating(img.id)
            if getattr(args, "json", False):
                print(json.dumps({
                    "id": img.id, "filename": img.filename,
                    "path": img.path, "status": status,
                    "edited": edited == "*", "rating": rating,
                    "flag": rflag,
                }))
                continue
            stars = ("★" * rating).ljust(5)
            mark = {"pick": "P", "reject": "X"}.get(rflag, " ")
            print(f"{img.id:6d} {edited} {status:8s} {stars} {mark} "
                  f"{img.filename}")
    return 0


def cmd_rate(args) -> int:
    with _open_library(args) as lib:
        if args.stars is None and args.flag is None:
            if lib.get_image(args.image_id) is None:
                # A typo'd id must not read as "real, unrated"
                # (code-review r3).
                raise SystemExit(f"rate: no catalog image "
                                 f"{args.image_id}")
            rating, flag = lib.get_rating(args.image_id)
            print(json.dumps({"id": args.image_id, "rating": rating,
                              "flag": flag}))
            return 0
        try:
            lib.set_rating(args.image_id, rating=args.stars,
                           flag=args.flag)
        except ValueError as e:
            raise SystemExit(f"rate: {e}")
        rating, flag = lib.get_rating(args.image_id)
        print(json.dumps({"id": args.image_id, "rating": rating,
                          "flag": flag}))
    return 0


def cmd_collect(args) -> int:
    with _open_library(args) as lib:
        if args.action == "list":
            for name, count in lib.list_collections():
                print(json.dumps({"name": name, "images": count}))
            return 0
        if not args.name:
            raise SystemExit("collect: a collection name is required")
        try:
            if args.action == "add":
                n = lib.add_to_collection(args.name, args.ids)
                print(json.dumps({"name": args.name, "added": n}))
            elif args.action == "remove":
                n = lib.remove_from_collection(args.name, args.ids)
                print(json.dumps({"name": args.name, "removed": n}))
            elif args.action == "delete":
                ok = lib.delete_collection(args.name)
                print(json.dumps({"name": args.name, "deleted": ok}))
        except ValueError as e:
            raise SystemExit(f"collect: {e}")
    return 0


def cmd_edit(args) -> int:
    with _open_library(args) as lib:
        if lib.get_image(args.image_id) is None:
            raise SystemExit(f"no catalog image {args.image_id}")
        if args.reset:
            lib.delete_edits(args.image_id)
            print(json.dumps({"image_id": args.image_id, "reset": True}))
            return 0
        overrides = {
            name for name in EditParams.field_names()
            if getattr(args, name, None) is not None
        }
        if not overrides and not getattr(args, "preset", None):
            # Query mode: print the stored params without writing.
            print(lib.load_edit_params(args.image_id).to_json())
            return 0
        params = _params_from_args(args, lib.load_edit_params(args.image_id))
        lib.save_edit_params(args.image_id, params)
        print(params.to_json())
    return 0


def cmd_preset(args) -> int:
    from raweditor_tpu import presets as _presets

    if args.action == "list":
        print(json.dumps({"presets": _presets.list_presets(),
                          "dir": str(_presets.presets_dir())}))
        return 0
    if args.name is None:
        raise SystemExit(f"preset {args.action} needs a name")
    try:
        if args.action == "save":
            path = _presets.save_preset(
                args.name, _params_from_args(args))
            print(json.dumps({"saved": args.name, "path": path}))
        elif args.action == "show":
            print(json.dumps(_presets.load_preset(args.name),
                             sort_keys=True))
        elif args.action == "delete":
            _presets.delete_preset(args.name)
            print(json.dumps({"deleted": args.name}))
    except (KeyError, ValueError) as e:
        raise SystemExit(f"preset: {e}")
    return 0


def cmd_verify(args) -> int:
    with _open_library(args) as lib:
        print(json.dumps({
            "repending": lib.verify_cache(),
            "tombstoned": lib.verify_files(),
            "images": lib.image_count(),
        }))
    return 0


def cmd_tiers(args) -> int:
    from raweditor_tpu.pipeline.tiers import process_pending_cache

    with _open_library(args) as lib:
        lib.verify_cache()
        print(json.dumps(process_pending_cache(lib, args.cache_dir)))
    return 0
