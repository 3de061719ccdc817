"""llamatpu CLI — single entry point for run/serve/bench.

Flag surface mirrors the reference's launcher + Options
(llama-tornado:446-657, Options.java:75-139): --model, --prompt/-p,
--system-prompt/-sp, --interactive/-i, --instruct, --temperature/-temp,
--top-p, --seed, --max-tokens/-n, --stream, --echo, --server, --port,
--service (bench) plus TPU-specific knobs (--impl, --dtype, --prefill-chunk,
--metrics-format).
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llamatpu", description="TPU-native GGUF LLM engine")
    sub = p.add_subparsers(dest="command")

    def common(sp):
        sp.add_argument("--model", "-m", required=True, help="path to GGUF checkpoint")
        sp.add_argument("--max-tokens", "-n", type=int, default=512,
                        help="max total tokens (prompt + generation), clamps context")
        sp.add_argument("--impl", choices=["auto", "xla", "pallas", "int8"], default="auto",
                        help="kernel implementation: auto = pallas on TPU "
                             "(fused dequant-matmul + decode attention), "
                             "xla elsewhere; int8 = exact llama.cpp Q8_0 "
                             "numerics (activations quantized per-32 block, "
                             "int8xint8 int32-accumulated dot — the ppl-parity "
                             "mode, ops/int8_matmul.py; decode/ppl widths only)")
        sp.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                        help="activation/weight compute dtype")
        sp.add_argument("--kv-dtype", choices=["auto", "bf16", "f32", "int8"],
                        default="auto",
                        help="KV cache dtype; int8 halves cache HBM "
                             "(per-token-head scales, ops/kv_quant.py)")
        sp.add_argument("--pack4", action="store_true",
                        help="store Q4_0 weights as packed nibbles: half the "
                             "HBM footprint, same decode speed (the chip is "
                             "value-rate-bound; fits e.g. Qwen1.5-MoE on one chip)")
        sp.add_argument("--rowq", action="store_true",
                        help="serve Q8_0 weights as per-row int8 (q8_row): "
                             "scale-free decode streaming + int8 MXU prefill; "
                             "fidelity measured by the PARITY q8_row rows")
        sp.add_argument("--prefill-chunk", type=int, default=128)
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--metrics-format", choices=["human", "json", "github", "none"],
                        default="human")
        sp.add_argument("--metrics-file", default=None,
                        help="append run metrics as one JSON line to this "
                             "file (reference: llama.metrics.file)")
        sp.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel degree (0 = single device)")
        sp.add_argument("--dp", type=int, default=1, help="data-parallel degree")
        sp.add_argument("--ep", action="store_true",
                        help="expert-parallel MoE: whole experts sharded over tp")
        sp.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel degree (KV S-axis sharded; "
                             "attention reductions all-reduce over the axis)")
        # NOT "--pp": the bench subcommand uses --pp for prompt lengths
        # (llama-bench parity)
        sp.add_argument("--pipeline", type=int, default=1, dest="pipeline",
                        help="pipeline-parallel degree (layer stages, "
                             "shard_map microbatch pipeline; composes with dp)")
        sp.add_argument("--spec-decode", type=int, default=0,
                        help="prompt-lookup speculative decoding draft length "
                             "(greedy only, exact; 0 = off)")
        sp.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace into this directory")
        sp.add_argument("--dump-hlo", default=None,
                        help="write the decode program's HLO to this file")

    run = sub.add_parser("run", help="single-prompt or interactive generation")
    common(run)
    run.add_argument("--prompt", "-p", help="instruct prompt")
    run.add_argument("--system-prompt", "-sp", default=None)
    run.add_argument("--interactive", "-i", action="store_true")
    run.add_argument("--temperature", "-temp", type=float, default=None,
                     help="default: family-specific (ChatFormat.defaultTemperature)")
    run.add_argument("--top-p", type=float, default=None)
    run.add_argument("--stream", action=argparse.BooleanOptionalAction, default=True)
    run.add_argument("--echo", action="store_true")
    run.add_argument("--no-thinking", action="store_true",
                     help="suppress Qwen3 reasoning via pre-closed <think></think>")

    serve = sub.add_parser("serve", help="OpenAI-compatible HTTP server")
    common(serve)
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=8080)
    serve.add_argument("--batch-size", type=int, default=1,
                       help="continuous-batching slots")
    serve.add_argument("--paged", action="store_true",
                       help="paged KV cache (shared block pool across lanes)")
    serve.add_argument("--kv-blocks", type=int, default=0,
                       help="paged pool size in blocks (0 = auto)")
    serve.add_argument("--kv-block-size", type=int, default=16)
    serve.add_argument("--no-prefix-cache", action="store_true",
                       help="disable KV prefix reuse across requests")
    serve.add_argument("--interleave-decode-steps", type=int, default=4,
                       help="decode steps run between prefill chunks while a "
                            "prompt is still feeding (TTFT vs decode tradeoff)")

    ppl = sub.add_parser("ppl", help="perplexity evaluation")
    common(ppl)
    ppl.add_argument("--text-file", help="UTF-8 text file to evaluate")
    ppl.add_argument("--text", help="inline text to evaluate")
    ppl.add_argument("--chunk", type=int, default=128)

    conv = sub.add_parser("convert", help="requantize a GGUF checkpoint to Q8_0")
    conv.add_argument("--model", "-m", required=True)
    conv.add_argument("--output", "-o", required=True)

    val = sub.add_parser("validate", help="one-command checkpoint validation: "
                         "tokenizer fidelity, finite forward, greedy sample, "
                         "golden-token comparison, quick ppl")
    common(val)
    val.add_argument("--golden", default=None,
                     help="golden fixture JSON to compare against (default: "
                          "fixtures/golden/<family>.json if present)")
    val.add_argument("--update-golden", action="store_true",
                     help="write the observed outputs as the golden fixture")
    val.add_argument("--prompt", "-p", default="The capital of France is",
                     help="deterministic probe prompt")

    bench = sub.add_parser("bench", help="llama-bench style pp/tg matrix")
    common(bench)
    bench.add_argument("--pp", type=int, nargs="*", default=[512], help="prompt lengths")
    bench.add_argument("--tg", type=int, nargs="*", default=[128], help="generation lengths")
    bench.add_argument("--pg", nargs="*", default=[],
                       help="combined prompt+gen specs, e.g. 512+128")
    bench.add_argument("--depth", "-d", type=int, nargs="*", default=[0],
                       help="untimed KV prefill depth before the timed window")
    bench.add_argument("--reps", "-r", type=int, default=3)
    bench.add_argument("--output", "-o", choices=["md", "csv", "json", "jsonl", "sql"],
                       default="md")
    bench.add_argument("--batch", "-b", type=int, default=1)
    return p


def _load(args, max_tokens=None):
    import jax.numpy as jnp

    from llamatpu.models.loader import load_model
    from llamatpu.utils.metrics import RunMetrics, Timer

    metrics = RunMetrics()
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    with Timer() as t:
        model = load_model(args.model, max_tokens=max_tokens or args.max_tokens,
                           param_dtype=dtype, pack4=getattr(args, "pack4", False))
    metrics.load_s = t.elapsed
    return model, metrics, dtype


def _mesh(args):
    """Build a (dp, pp, sp, tp) mesh when parallelism is requested (multi-host
    init happens automatically via env — parallel/distributed.py)."""
    if (getattr(args, "tp", 0) <= 1 and getattr(args, "dp", 1) <= 1
            and getattr(args, "sp", 1) <= 1
            and getattr(args, "pipeline", 1) <= 1):
        return None
    from llamatpu.parallel import make_mesh
    from llamatpu.parallel.distributed import initialize

    initialize()
    return make_mesh(tp=max(args.tp, 1), dp=max(args.dp, 1),
                     sp=max(getattr(args, "sp", 1), 1),
                     pp=max(getattr(args, "pipeline", 1), 1))


def _resolve_impl(args) -> None:
    """--impl auto -> pallas on TPU (fastest on every measured path: decode
    attention, fused dequant-matmul, paged block-table kernel), xla on CPU
    (pallas interpret mode is for tests). Mutates args.impl in place so every
    downstream consumer sees the concrete choice."""
    if getattr(args, "impl", None) == "auto":
        import jax

        args.impl = "pallas" if jax.default_backend() == "tpu" else "xla"


def _cache_dtype(args):
    import jax.numpy as jnp

    kv = getattr(args, "kv_dtype", "auto")
    if kv == "auto":
        return jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    return {"bf16": jnp.bfloat16, "f32": jnp.float32, "int8": jnp.int8}[kv]


def cmd_run(args) -> int:
    import jax.numpy as jnp

    from llamatpu.runtime.engine import Engine
    from llamatpu.runtime.session import run_instruct_once, run_interactive

    model, metrics, dtype = _load(args)
    fmt = model.chat_format
    temp = args.temperature if args.temperature is not None else fmt.default_temperature()
    top_p = args.top_p if args.top_p is not None else fmt.default_top_p()
    engine = Engine(model, impl=args.impl, temperature=temp, top_p=top_p,
                    seed=args.seed, prefill_chunk=args.prefill_chunk,
                    cache_dtype=_cache_dtype(args), metrics=metrics,
                    mesh=_mesh(args), ep=getattr(args, "ep", False),
                    spec_decode=getattr(args, "spec_decode", 0),
                    rowq=getattr(args, "rowq", False))
    if args.dump_hlo:
        from llamatpu.utils.profiling import dump_decode_hlo

        dump_decode_hlo(engine, args.dump_hlo)
        print(f"wrote decode HLO to {args.dump_hlo}", file=sys.stderr)

    from llamatpu.utils.profiling import trace

    with trace(args.profile_dir):
        if args.interactive:
            run_interactive(model, engine, args.system_prompt, args.max_tokens)
        else:
            if not args.prompt:
                print("error: --prompt required (or --interactive)", file=sys.stderr)
                return 2
            run_instruct_once(model, engine, args.prompt, args.system_prompt,
                              max_new_tokens=args.max_tokens, stream=args.stream,
                              echo=args.echo, enable_thinking=not args.no_thinking)
    if args.metrics_format != "none":
        metrics.render(args.metrics_format)
    if getattr(args, "metrics_file", None):
        metrics.write_file(args.metrics_file)
    return 0


def cmd_serve(args) -> int:
    from llamatpu.server.openai_server import serve

    serve(args)
    return 0


def cmd_bench(args) -> int:
    from llamatpu.bench.llama_bench import run_bench

    run_bench(args)
    return 0


def cmd_ppl(args) -> int:
    import json

    from llamatpu.bench.perplexity import perplexity_of_text

    if not args.text and not args.text_file:
        print("error: --text or --text-file required", file=sys.stderr)
        return 2
    text = args.text or open(args.text_file, encoding="utf-8").read()
    model, metrics, dtype = _load(args)
    res = perplexity_of_text(model, text, chunk=args.chunk, impl=args.impl)
    print(json.dumps({"ppl": round(res["ppl"], 4), "tokens": res["tokens"]}))
    return 0


def cmd_convert(args) -> int:
    import json

    from llamatpu.gguf.convert import requantize_gguf

    stats = requantize_gguf(args.model, args.output)
    print(json.dumps(stats))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "convert":
        return cmd_convert(args)
    _resolve_impl(args)
    if args.command == "run":
        return cmd_run(args)
    if args.command == "serve":
        return cmd_serve(args)
    if args.command == "bench":
        return cmd_bench(args)
    if args.command == "ppl":
        return cmd_ppl(args)
    if args.command == "validate":
        from llamatpu.bench.validate import validate

        return validate(args)
    build_parser().print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
