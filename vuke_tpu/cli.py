"""vuke-tpu CLI: generate | scan | single | bench | analyze | query.

Mirrors the reference command surface (/root/reference/src/main.rs:100-434)
— same subcommands, flags, env-var bindings and output formats — with
TPU-specific additions (--batch superbatch size, --platform override).

Run as ``python -m vuke_tpu.cli <command> ...``.
"""

from __future__ import annotations

import sys

import click

from . import encode


def _parse_byte_size(s: str) -> int:
    """100M / 1G / plain bytes (/root/reference/src/main.rs:29-46)."""
    s = s.strip().upper()
    mult = 1
    if s.endswith("K"):
        mult, s = 1024, s[:-1]
    elif s.endswith("M"):
        mult, s = 1024 ** 2, s[:-1]
    elif s.endswith("G"):
        mult, s = 1024 ** 3, s[:-1]
    try:
        return int(s) * mult
    except ValueError:
        raise click.BadParameter(f"invalid byte size: {s!r}")


def _common_run_options(f):
    opts = [
        click.option("--transform", "transforms", multiple=True, default=("sha256",),
                     help="Transform(s) to apply (e.g., sha256, lcg, lcg:glibc:le)"),
        click.option("--network", default="bitcoin",
                     help="Network (bitcoin, testnet, signet, regtest)"),
        click.option("--verbose", "-v", is_flag=True, help="Verbose output"),
        click.option("--output", "-o", "output_path", type=click.Path(), default=None,
                     help="Output file (default: stdout)"),
        click.option("--storage", "storage_dir", type=click.Path(), default=None,
                     help="Storage directory for Parquet output"),
        click.option("--chunk-records", default=1_000_000, type=int),
        click.option("--chunk-bytes", default="100M", callback=lambda c, p, v: _parse_byte_size(v)),
        click.option("--compression", default="zstd",
                     type=click.Choice(["zstd", "snappy", "gzip", "lz4", "none"])),
        click.option("--compression-level", default=3, type=click.IntRange(1, 22)),
        click.option("--cloud-upload", is_flag=True),
        click.option("--cloud-endpoint", envvar="CLOUD_ENDPOINT", default=None),
        click.option("--cloud-bucket", envvar="CLOUD_BUCKET", default=None),
        click.option("--cloud-delete-local", is_flag=True),
        click.option("--cloud-fail-fast", is_flag=True),
        click.option("--iceberg-catalog", envvar="ICEBERG_CATALOG", default=None),
        click.option("--iceberg-namespace", envvar="ICEBERG_NAMESPACE", default="vuke"),
        click.option("--iceberg-table", envvar="ICEBERG_TABLE", default="results"),
        click.option("--batch", default=None, type=int,
                     help="Device superbatch size (seeds per dispatch; "
                          "default 65536, clamped to small ranges)"),
        click.option("--checkpoint", "checkpoint_path", type=click.Path(),
                     default=None,
                     help="Manifest path for durable scan progress: completed "
                          "seed sub-ranges are recorded atomically and skipped "
                          "on resume (numeric sources only)"),
        click.option("--bitimage-path", default="m/84'/0'/0'/0/0"),
        click.option("--bitimage-passphrase", default=""),
        click.option("--bitimage-passphrase-wordlist", type=click.Path(), default=None),
        click.option("--bitimage-derive-count", default=1, type=int),
    ]
    for o in reversed(opts):
        f = o(f)
    return f


def _source_commands(group, runner):
    """Attach range/wordlist/timestamps/stdin/files subcommands to a group."""

    @group.command("range")
    @click.option("--start", type=int, required=True, help="Start of range")
    @click.option("--end", type=int, required=True, help="End of range")
    @click.pass_context
    def _range(ctx, start, end):
        from .sources import RangeSource
        runner(ctx.parent.params, RangeSource(start, end))

    @group.command("wordlist")
    @click.option("--file", "path", type=click.Path(exists=True), required=True)
    @click.pass_context
    def _wordlist(ctx, path):
        from .sources import WordlistSource
        runner(ctx.parent.params, WordlistSource(path))

    @group.command("timestamps")
    @click.option("--start", required=True, help="Start date (YYYY-MM-DD)")
    @click.option("--end", required=True, help="End date (YYYY-MM-DD)")
    @click.option("--microseconds", is_flag=True, help="Also test milliseconds")
    @click.pass_context
    def _timestamps(ctx, start, end, microseconds):
        from .sources import TimestampSource
        runner(ctx.parent.params, TimestampSource.from_dates(start, end, microseconds))

    @group.command("stdin")
    @click.pass_context
    def _stdin(ctx):
        from .sources import StdinSource
        runner(ctx.parent.params, StdinSource())

    @group.command("files")
    @click.option("--file", "file_path", type=click.Path(exists=True), default=None)
    @click.option("--dir", "dir_path", type=click.Path(exists=True), default=None)
    @click.pass_context
    def _files(ctx, file_path, dir_path):
        from .sources import FilesSource
        if bool(file_path) == bool(dir_path):
            raise click.UsageError("exactly one of --file / --dir required")
        src = FilesSource(file_path or dir_path, recursive=bool(dir_path))
        runner(ctx.parent.params, src)


# subcommands that never touch a device: the group callback must not
# import jax for them (vuke single is pure host code and the ./vuke
# launcher runs it under `python -S` with jax never loaded)
_HOST_ONLY_COMMANDS = {"single", "query"}


@click.group()
@click.option("--no-tpu", is_flag=True,
              help="Run on the CPU backend (the reference's --no-gpu analogue)")
@click.pass_context
def cli(ctx, no_tpu):
    """TPU-native weak-Bitcoin-key search framework (vuke capability surface)."""
    from .telemetry import setup_logging

    setup_logging()
    if ctx.invoked_subcommand in _HOST_ONLY_COMMANDS:
        return
    from ._cache import enable_compile_cache

    enable_compile_cache()
    if no_tpu:
        from ._cache import apply_cpu_compile_flags

        # compile-speed flags must land before the CPU client initializes
        # (first device use) — without them a first planted-hit scan paid
        # 4+ minutes of LLVM -O3 compiles
        apply_cpu_compile_flags()
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:
            click.echo(f"Warning: could not switch to CPU backend: {e}", err=True)


# ---------------------------------------------------------------------------
# generate / scan
# ---------------------------------------------------------------------------

def _build_outputs(params, deriver):
    from .output import ConsoleOutput, MultiOutput
    outputs = []
    if params.get("output_path"):
        outputs.append(ConsoleOutput.to_file(params["output_path"],
                                             verbose=params.get("verbose", False)))
    else:
        outputs.append(ConsoleOutput(verbose=params.get("verbose", False)))
    storage_output = None
    if params.get("storage_dir"):
        from .storage import ParquetBackend, StorageOutput
        backend = ParquetBackend(
            params["storage_dir"],
            max_records_per_chunk=params.get("chunk_records", 1_000_000),
            max_bytes_per_chunk=params.get("chunk_bytes", 100 * 1024 * 1024),
            compression=params.get("compression", "zstd"),
            compression_level=params.get("compression_level", 3),
        )
        storage_output = StorageOutput(backend)
        outputs.append(storage_output)
    out = outputs[0] if len(outputs) == 1 else MultiOutput(outputs)
    return out, storage_output


def _post_run_storage(params, storage_output):
    """finish -> cloud upload -> Iceberg registration tail
    (/root/reference/src/main.rs:695-740, 1043-1278)."""
    if storage_output is None:
        return
    summary = storage_output.finish()
    if summary.paths:
        import os
        total = sum(os.path.getsize(p) for p in summary.paths if os.path.exists(p))
        click.echo(f"\nStorage: {len(summary.paths)} files written "
                   f"({_format_bytes(total)})", err=True)
        for p in summary.paths:
            sz = __import__("os").path.getsize(p) if __import__("os").path.exists(p) else 0
            click.echo(f"  {p} ({_format_bytes(sz)})", err=True)
    if params.get("cloud_upload") and summary.paths:
        from .storage.cloud import CloudConfig, sync_to_cloud
        cfg = CloudConfig(
            endpoint=params.get("cloud_endpoint"),
            bucket=params.get("cloud_bucket"),
            delete_local=params.get("cloud_delete_local", False),
            fail_fast=params.get("cloud_fail_fast", False),
        )
        stats_by_key = None
        if params.get("iceberg_catalog"):
            # stat local chunks BEFORE upload: --cloud-delete-local removes
            # them, and the snapshot needs real size/record-count stats
            from .storage.iceberg import stat_local_files
            try:
                stats_by_key = stat_local_files(summary.paths, params["storage_dir"])
            except Exception as e:
                click.echo(f"Iceberg: could not stat local chunks: {e}", err=True)
        uploaded = sync_to_cloud(summary.paths, params["storage_dir"], cfg)
        if params.get("iceberg_catalog") and uploaded:
            from .storage.iceberg import join_uploaded_metadata, register_snapshot
            files = (join_uploaded_metadata(stats_by_key, uploaded,
                                            endpoint=params.get("cloud_endpoint"))
                     if stats_by_key is not None else uploaded)
            register_snapshot(
                catalog_url=params["iceberg_catalog"],
                namespace=params.get("iceberg_namespace", "vuke"),
                table=params.get("iceberg_table", "results"),
                files=files,
            )


def _format_bytes(n: int) -> str:
    for unit, div in (("GB", 1024 ** 3), ("MB", 1024 ** 2), ("KB", 1024)):
        if n >= div:
            return f"{n / div:.1f} {unit}"
    return f"{n} B"


def _parse_specs(params):
    from .transforms import parse_transform
    specs = []
    for t in params["transforms"]:
        try:
            if t.lower() == "bitimage":
                from .transforms.wallets import bitimage_spec
                specs.append(bitimage_spec(
                    path=params.get("bitimage_path", "m/84'/0'/0'/0/0"),
                    passphrase=params.get("bitimage_passphrase", ""),
                    passphrase_wordlist=params.get("bitimage_passphrase_wordlist"),
                    derive_count=params.get("bitimage_derive_count", 1),
                ))
            else:
                specs.append(parse_transform(t))
        except (ValueError, NotImplementedError) as e:
            raise click.UsageError(str(e))
    return specs


def _run_forward(params, source, matcher):
    import dataclasses

    from .derive import KeyDeriver
    from .pipeline import DEFAULT_BATCH, ForwardDriver, ProcessStats, StringDriver
    from .progress import Progress
    from .telemetry import profile_trace
    from .parallel.multihost import maybe_initialize_distributed, partition_range

    deriver = KeyDeriver(encode.parse_network(params["network"]))
    specs = _parse_specs(params)
    out, storage_output = _build_outputs(params, deriver)
    click.echo("Scanning..." if matcher is not None else "Generating keys...", err=True)

    ranged = hasattr(source, "start") and hasattr(source, "end")
    pidx, pcount = maybe_initialize_distributed()
    if pcount > 1 and ranged:
        # static per-host ownership of the seed range (multihost.py) — ICI
        # shards within a host via the mesh; hosts split the space over DCN
        shard = partition_range(source.start, source.end, pcount, pidx)
        click.echo(f"Host {pidx}/{pcount}: seeds [{shard.start}, {shard.end}]",
                   err=True)
        source = dataclasses.replace(source, start=shard.start, end=shard.end)

    label = "scan" if matcher else "generate"
    if ranged:
        total = source.end - source.start + 1
        if getattr(source, "microseconds", False):
            total += (source.end + 1) * 1000 - source.start * 1000
        progress = Progress(total=total, label=label)
    else:
        # wordlist/stdin/files: input count unknown upfront — position+rate
        # bar, matching the reference's per-source indicatif spinners
        progress = Progress(total=None, label=label)

    explicit_batch = params.get("batch") is not None
    batch = params.get("batch") or DEFAULT_BATCH
    if ranged and total < batch:
        # a superbatch larger than the range derives dead lanes (validity
        # masks inputs, not compute): a 4096-seed scan at the 65536
        # default burned ~4 minutes of pure wasted ECC on the CPU
        # backend.  Clamp to the range, tile-aligned for the Pallas path.
        clamped = max(1024, -(-total // 1024) * 1024)
        if explicit_batch:
            click.echo(f"note: --batch {batch} exceeds the {total}-seed "
                       f"range; clamping to {clamped}", err=True)
        batch = clamped
    fwd = ForwardDriver(specs, matcher, out, deriver,
                        batch=batch, progress=progress)
    sd = StringDriver(specs, matcher, out, deriver, progress=progress)

    ckpt = None
    if params.get("checkpoint_path") and ranged:
        from .parallel.checkpoint import SweepCheckpoint
        job = (f"{'scan' if matcher else 'generate'}:"
               f"{','.join(sorted(params['transforms']))}:"
               f"{source.start}-{source.end}")
        path = params["checkpoint_path"]
        if pcount > 1:
            path = f"{path}.h{pidx}"
        ckpt = SweepCheckpoint.load(path, job)

    with profile_trace():
        if ckpt is not None:
            stats = ProcessStats()
            chunk = max(batch * 16, 1)
            for s, e in ckpt.pending_ranges(source.start, source.end):
                pos = s
                while pos <= e:
                    ce = min(e, pos + chunk - 1)
                    sub = dataclasses.replace(source, start=pos, end=ce)
                    stats.merge(sub.process(fwd, sd))
                    ckpt.mark_completed(pos, ce)
                    ckpt.save()
                    pos = ce + 1
        else:
            stats = source.process(fwd, sd)
    if progress is not None:
        progress.finish()
    out.flush()
    if hasattr(out, "close"):
        out.close()
    click.echo(f"Done. Inputs: {stats.inputs_processed}, Keys: {stats.keys_generated}, "
               f"Matches: {stats.matches_found}", err=True)
    _post_run_storage(params, storage_output)


@cli.group("generate")
@_common_run_options
def generate(**params):
    """Generate keys and output ALL (no address matching)."""


_source_commands(generate, lambda params, source: _run_forward(params, source, None))


@cli.group("scan")
@_common_run_options
@click.option("--targets", required=True,
              help="Target addresses: file path OR provider (e.g., boha:b1000:unsolved)")
def scan(**params):
    """Scan for specific addresses."""


def _run_scan(params, source):
    from .matcher import Matcher
    from . import provider
    t = params["targets"]
    resolved = provider.resolve(t)
    if resolved is not None:
        if not resolved.addresses:
            # a scan against zero targets finds nothing by construction —
            # fail loudly instead of silently burning device time
            raise click.ClickException(
                f"{resolved.description} resolved to 0 usable addresses"
                + (f" ({resolved.skipped_offline} matching entries ship "
                   f"address: null in the offline dataset — see "
                   f"tools/build_puzzles.py provenance notes)"
                   if resolved.skipped_offline else ""))
        if resolved.skipped_offline:
            click.echo(
                f"warning: {resolved.skipped_offline} matching puzzles have "
                f"no offline address and are NOT scanned for", err=True)
        matcher = Matcher.from_addresses(resolved.addresses)
        click.echo(f"Loaded {matcher.count()} target addresses from provider {t}", err=True)
    else:
        matcher = Matcher.load(t)
        click.echo(f"Loaded {matcher.count()} target addresses", err=True)
    _run_forward(params, source, matcher)


_source_commands(scan, _run_scan)


# ---------------------------------------------------------------------------
# single
# ---------------------------------------------------------------------------

@cli.command("warmup")
@click.option("--transform", "transforms", multiple=True,
              default=("milksad", "direct"),
              help="Numeric transforms to precompile (repeatable)")
@click.option("--batch", type=int, default=None,
              help="Superbatch size to warm (default: scan default)")
def warmup(transforms, batch):
    """Precompile the scan hot programs for the current backend.

    The reference pays its compiles at cargo-build time; this stack pays
    them at first jit trace — on a cold CPU backend that is one ~100s
    LLVM compile of the fused derive+match program landing on the user's
    FIRST scan.  Running warmup once (after install, or in an image
    build) moves that cost here instead: compiled programs land in the
    persistent cache (.jax_cache), so every later process — including a
    first planted-hit scan — starts hot.  Target pools are padded to
    shape-stable sizes (matcher.py MIN_POOL), so one warm covers any
    target set up to 512 addresses per pool.
    """
    import time as _time

    import jax as _jax
    import jax.numpy as _jnp

    from .matcher import DeviceTargetSet, Matcher
    from .pipeline import DEFAULT_BATCH, DeriveMatcher, _keygen_program
    from .transforms import parse_transform

    b = batch or DEFAULT_BATCH
    S = _jax.ShapeDtypeStruct
    u32 = _jnp.uint32
    matcher = Matcher.from_addresses(["1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"])
    dm = DeriveMatcher(DeviceTargetSet(matcher.targets), collect_keys=False)
    if dm._native:
        # CPU backends derive through the native C++ pipeline — nothing to
        # compile; warm only its one-time window-table build (~100 ms)
        t0 = _time.time()
        from . import native as _native
        import numpy as _np
        _native.batch_derive_h160(_np.ones((64, 8), dtype=_np.uint32))
        click.echo(f"native derive path active; table build "
                   f"{_time.time() - t0:.1f}s (no XLA derive compile needed)",
                   err=True)
    else:
        pool_avals = tuple(S(p.shape, p.dtype) for p in dm._pool_args)
        # AOT-lower + compile (no execution: one full-batch ECC derive runs
        # ~4.5 min on the CPU backend — the compile is what we're here for;
        # compiled programs land in the persistent cache either way)
        t0 = _time.time()
        dm._fn.lower(S((b, 8), u32), S((b,), _jnp.bool_),
                     *pool_avals).compile()
        click.echo(f"warmed derive+match (batch {b}, shared by all numeric "
                   f"transforms): {_time.time() - t0:.1f}s", err=True)

    for t in transforms:
        spec = parse_transform(t)
        if spec.numeric is None:
            click.echo(f"skipping {t}: string transform (host path)", err=True)
            continue
        if getattr(spec.numeric, "host_only", False):
            click.echo(f"skipping {t}: host-only transform", err=True)
            continue
        t0 = _time.time()
        kg = _keygen_program(spec.numeric)
        kg.lower(S((), u32), S((), u32), S((), u32), S((b,), u32)).compile()
        # the singleton hit-confirm program (_derive_seed_slot) only
        # compiles on the FIRST HIT — precompile it too, or a planted-hit
        # scan still pays a cold compile at the worst moment
        fn = _jax.jit(spec.numeric.fn)
        fn.lower(S((1,), u32), S((1,), u32)).compile()
        spec.numeric._compiled_single = fn
        click.echo(f"warmed {t} keygen + hit-confirm: "
                   f"{_time.time() - t0:.1f}s", err=True)


@cli.command("single")
@click.argument("passphrase")
@click.option("--transform", "transform_s", default="sha256")
@click.option("--network", default="bitcoin")
def single(passphrase, transform_s, network):
    """Generate single key from passphrase.

    Output format matches /root/reference/src/main.rs:954-992 exactly —
    this is the bit-exactness contract surface.
    """
    from .derive import KeyDeriver
    from .transforms import parse_transform
    try:
        spec = parse_transform(transform_s)
    except (ValueError, NotImplementedError) as e:
        raise click.UsageError(str(e))
    deriver = KeyDeriver(encode.parse_network(network))

    keys = []  # (source_label, key bytes)
    if spec.string is not None:
        kw = spec.string.fn([passphrase])
        valid = (spec.string.valid_fn([passphrase]) if spec.string.valid_fn
                 else None)
        from .cores.common import key_words_to_bytes
        label = getattr(spec.string, "label_fn", None) or (lambda s: s)
        for s_i, slot in enumerate(spec.string.slots):
            if valid is not None and not valid[0, s_i]:
                continue
            keys.append((f"{label(passphrase)}{slot}", key_words_to_bytes(kw[0, s_i])))

    if not keys:
        click.echo("No key generated from passphrase.", err=True)
        return

    for source, key in keys:
        derived = deriver.derive(key)
        click.echo(f'Passphrase: "{passphrase}"')
        click.echo(f"Transform: {spec.name}")
        click.echo(f"Source: {source}")
        click.echo("---")
        click.echo(f"Private Key (hex):     {derived.private_key_hex}")
        click.echo(f"Private Key (decimal): {derived.private_key_decimal}")
        click.echo(f"Private Key (binary):  {derived.private_key_binary}")
        click.echo(f"Bit Length:            {derived.bit_length}")
        click.echo(f"Hamming Weight:        {derived.hamming_weight}")
        click.echo(f"Leading Zeros (hex):   {derived.leading_zeros}")
        click.echo(f"WIF (compressed):      {derived.wif_compressed}")
        click.echo(f"WIF (uncompressed):    {derived.wif_uncompressed}")
        click.echo("---")
        click.echo(f"P2PKH (compressed):   {derived.p2pkh_compressed}")
        click.echo(f"P2PKH (uncompressed): {derived.p2pkh_uncompressed}")
        click.echo(f"P2WPKH:               {derived.p2wpkh}")


# ---------------------------------------------------------------------------
# bench
# ---------------------------------------------------------------------------

@cli.command("bench")
@click.option("--transform", "transform_s", default="sha256")
@click.option("--json", "as_json", is_flag=True)
@click.option("--batch", default=1 << 16, type=int)
@click.option("--seconds", default=5.0, type=float)
def bench(transform_s, as_json, batch, seconds):
    """Run benchmark (2s warmup + timed measurement, M inputs/s —
    /root/reference/src/benchmark.rs:11-68)."""
    from .benchmark import run_benchmark
    run_benchmark(transform_s, as_json=as_json, batch=batch, seconds=seconds)


# ---------------------------------------------------------------------------
# analyze
# ---------------------------------------------------------------------------

@cli.command("analyze")
@click.argument("key")
@click.option("--fast", is_flag=True, help="Skip brute-force checks")
@click.option("--mask", type=click.IntRange(1, 64), default=None)
@click.option("--cascade", default=None, help="bits:target,bits:target,...")
@click.option("--analyzer", "analyzers", multiple=True)
@click.option("--mnemonic", default=None)
@click.option("--mnemonic-file", type=click.Path(), default=None)
@click.option("--passphrase", default="")
@click.option("--chain-depth", default=10, type=int)
@click.option("--puzzle", default=None)
@click.option("--verify", "verify_p", default=None)
@click.option("--json", "as_json", is_flag=True)
@click.option("--batch", default=None, type=int,
              help="Sweep superbatch (default: 2^24 on accelerators — "
                   "dispatch-latency-bound below that — else 2^20)")
@click.option("--max-seeds", default=None, type=int,
              help="Bound open-ended sweeps (TPU addition; default unbounded)")
@click.option("--checkpoint", "checkpoint_path", type=click.Path(), default=None,
              help="Manifest path for durable brute-force progress "
                   "(resume preempted sweeps; TPU addition)")
def analyze(key, fast, mask, cascade, analyzers, mnemonic, mnemonic_file,
            passphrase, chain_depth, puzzle, verify_p, as_json, batch, max_seeds,
            checkpoint_path):
    """Analyze a private key for potential vulnerable origins."""
    from .analyze import run_analyze
    run_analyze(key_str=key, fast=fast, mask=mask, cascade=cascade,
                analyzers=list(analyzers), mnemonic=mnemonic,
                mnemonic_file=mnemonic_file, passphrase=passphrase,
                chain_depth=chain_depth, puzzle=puzzle, verify=verify_p,
                as_json=as_json, batch=batch, max_seeds=max_seeds,
                checkpoint=checkpoint_path)


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

@cli.command("query")
@click.argument("path", type=click.Path(exists=True))
@click.argument("sql", required=False)
@click.option("--format", "-f", "fmt", default="table",
              type=click.Choice(["table", "json", "csv"]))
@click.option("--schema", "show_schema", is_flag=True)
def query(path, sql, fmt, show_schema):
    """Query stored results using SQL."""
    from .storage.query import QueryExecutor, format_results
    ex = QueryExecutor(path)
    if show_schema:
        click.echo(ex.schema_text())
        return
    if not sql:
        raise click.UsageError("SQL query required (or use --schema)")
    rows, columns = ex.query(sql)
    click.echo(format_results(rows, columns, fmt))


def main():
    cli(prog_name="vuke-tpu")


if __name__ == "__main__":
    main()
