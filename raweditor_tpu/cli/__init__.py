"""Headless command-line interface.

The reference is a GUI app; its workflows map to subcommands here:

  import   recursive folder import + tier-cache generation
           (reference: main.rs:1840-1924 + raw/processor.rs)
  list     catalog listing (reference library grid, main.rs:1295-1430)
  info     decode metadata for one file (reference: raw/loader.rs:75-143)
  convert  rewrite RAW files as archival DNG (bit-exact sensor data)
  develop  one-shot develop of a file or catalog id to JPEG/PNG
           (reference develop tab + export, main.rs:1433-1799)
  edit     save/reset slider values for a catalog image
           (reference: main.rs:597-717)
  export   batch export with stored edits, optionally mesh-sharded
           (BASELINE.md config 4)
  tiers    work the pending cache queue (reference: main.rs:404-495)
  histogram  print the 256-bin histogram (reference: gpu/pipeline.rs:615-736)
  synth    write a synthetic RAW (test/bench fixture)
  rate     star ratings / pick-reject flags (beyond the reference)
  verify   catalog integrity check (startup self-healing, on demand)
  auto     auto exposure/WB (+ levels/contrast/tone) suggestions
  collect  named collections: add/remove/delete/list
  preset   named develop presets: save/list/show/delete
  session  interactive develop loop on stdin (the develop tab, headless)
  serve    TCP develop service speaking the session protocol
  warmup   precompile develop programs for a sensor shape
  doctor   production environment self-check (one JSON report)
  bench    run the headline benchmark
"""

from __future__ import annotations

import sys

from raweditor_tpu.cli._parser import build_parser
from raweditor_tpu.cli._shared import (
    _add_lens_args,
    _add_slider_args,
    _apply_env_config_defaults,
    _clamp_zoom,
    _finite_pan,
    _finite_rotate,
    _open_engine,
    _open_library,
    _params_from_args,
    _parse_crop,
    _parse_lens,
    _parse_local_spec,
)
from raweditor_tpu.cli.catalog import (
    _apply_sidecars,
    cmd_collect,
    cmd_edit,
    cmd_import,
    cmd_list,
    cmd_preset,
    cmd_rate,
    cmd_sidecar,
    cmd_tiers,
    cmd_verify,
)
from raweditor_tpu.cli.develop_cmds import (
    _resolve_input,
    cmd_auto,
    cmd_convert,
    cmd_develop,
    cmd_histogram,
    cmd_info,
    cmd_synth,
    render_ascii_histogram,
)
from raweditor_tpu.cli.diag import cmd_bench, cmd_doctor, cmd_validate
from raweditor_tpu.cli.export_cmds import (
    _run_batch_export_checked,
    cmd_export,
    cmd_warmup,
)
from raweditor_tpu.cli.service import cmd_serve, cmd_session

_COMMANDS = {
    "import": cmd_import,
    "list": cmd_list,
    "info": cmd_info,
    "convert": cmd_convert,
    "rate": cmd_rate,
    "sidecar": cmd_sidecar,
    "collect": cmd_collect,
    "develop": cmd_develop,
    "edit": cmd_edit,
    "preset": cmd_preset,
    "export": cmd_export,
    "tiers": cmd_tiers,
    "verify": cmd_verify,
    "validate": cmd_validate,
    "histogram": cmd_histogram,
    "serve": cmd_serve,
    "synth": cmd_synth,
    "auto": cmd_auto,
    "session": cmd_session,
    "bench": cmd_bench,
    "warmup": cmd_warmup,
    "doctor": cmd_doctor,
}


def generate_cli_reference() -> str:
    """docs/cli.md content, generated from the argparse tree (a test
    asserts the committed file matches, so it can't go stale)."""
    ap = build_parser()
    out = ["# CLI reference", "",
           "Generated from the argparse tree "
           "(`python -m raweditor_tpu --help`).", ""]
    sub = next(a for a in ap._actions
               if hasattr(a, "choices") and a.choices)
    for name, p in sub.choices.items():
        out += [f"## `{name}`", "", "```", p.format_help().rstrip(),
                "```", ""]
    return "\n".join(out)


def main(argv=None) -> int:
    # Backend init happens lazily where JAX is actually used
    # (DevelopEngine/exporter/bench) — catalog-only commands must not
    # touch the TPU runtime.
    args = build_parser().parse_args(argv)
    _apply_env_config_defaults(args)
    if getattr(args, "xlat", None):
        from raweditor_tpu.raw import nikon_crypt

        try:
            nikon_crypt.inject_xlat_file(args.xlat)
        except (OSError, ValueError) as e:
            raise SystemExit(f"--xlat: {e}")
    try:
        return _COMMANDS[args.cmd](args)
    except BrokenPipeError:
        # `raweditor-tpu list | head`: the consumer closed the pipe.
        # Exit quietly like standard unix tools (128 + SIGPIPE),
        # pointing stdout at devnull so interpreter teardown doesn't
        # traceback on the final flush.
        import os as _os

        devnull = _os.open(_os.devnull, _os.O_WRONLY)
        _os.dup2(devnull, sys.stdout.fileno())
        return 141


if __name__ == "__main__":
    sys.exit(main())
