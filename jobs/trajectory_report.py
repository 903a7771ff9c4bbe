#!/usr/bin/env python
"""Conversation/trajectory-curation release job: the SFT-data tables.

spark-submit --py-files dist/dstlr_spark.zip jobs/trajectory_report.py \
    --sf-dir /root/testdata/sf0.1 --output /path/trajectory_report

Emits the conversation-layer tables an agent-transcript training-data
release ships (the conv_* surface, composed exactly like
jobs/media_report.py composes the media layer):

  transitions/  role→role turn-taking matrix (conv_role_transitions)
  turns/        per-conversation turn statistics (conv_turn_stats)
  tools/        tool-call usage statistics (conv_tool_stats)
  sessions/     gap-based sessionization (conv_sessionize)
  sft_pairs/    user→assistant SFT training pairs (conv_sft_pairs)
  latency/      reply-latency distribution inputs (conv_reply_latency)
  packing/      context-window truncate-left packing audit
                (conv_context_pack)
  echo/         assistant-echo (input-copy) scores (conv_assistant_echo)
  segments/     TextTiling-lite topic segments (conv_topic_segments)
  sequences/    dominant tool-call sequences (conv_tool_sequences)
  loops/        degenerate agent-loop (stuck-cycle) flags
                (conv_agent_loops)

Every table is produced by the same oracle-gated operators the driver
value-checks — this job is their composition, not a re-implementation.
All stages ride one conversation-partitioned shuffle shape (the
`_turns` shred), so a release run pays the shred once per executor
pass and every table is embarrassingly parallel at 10^12 turns.
"""

from __future__ import annotations

import argparse

from dstlr_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = get_spark("dstlr-trajectory-report")
    from dstlr_spark.queries.conv import (
        q_agent_loops,
        q_assistant_echo,
        q_context_pack,
        q_reply_latency,
        q_role_transitions,
        q_sessionize,
        q_sft_pairs,
        q_tool_sequences,
        q_tool_stats,
        q_topic_segments,
        q_turn_stats,
    )

    tables = {
        "transitions": q_role_transitions,
        "turns": q_turn_stats,
        "tools": q_tool_stats,
        "sessions": q_sessionize,
        "sft_pairs": q_sft_pairs,
        "latency": q_reply_latency,
        "packing": q_context_pack,
        "echo": q_assistant_echo,
        "segments": q_topic_segments,
        "sequences": q_tool_sequences,
        "loops": q_agent_loops,
    }
    for name, q in tables.items():
        df = q(spark, args.sf_dir)
        df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        print(f"{name}: {spark.read.parquet(f'{args.output}/{name}').count()} rows")


if __name__ == "__main__":
    main()
