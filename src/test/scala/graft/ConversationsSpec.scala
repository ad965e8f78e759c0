package graft

import graft.operators.Conversations

class ConversationsSpec extends SparkSpec {
  import spark.implicits._

  // (conv, turn, role, text)
  private def run(rows: (Long, Long, String, String)*) =
    Conversations.assemble(rows.toDF("c", "t", "role", "x"),
        "c", "t", "role", "x")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), Option(r.getString(6)))))
      .toMap

  test("ok thread: transcript assembles in turn order with role tags; " +
    "token count sums the messages") {
    val got = run(
      (1L, 1L, "assistant", "hi there"),   // out-of-order input is fine
      (1L, 0L, "user", "hello"),
      (1L, 2L, "user", "how are you"))
    val (nMsgs, nTurns, maxTurn, nTok, status, tx) = got(1L)
    assert(nMsgs == 3 && nTurns == 3 && maxTurn == 2)
    assert(status == "ok")
    assert(tx.contains("user: hello\nassistant: hi there\nuser: how are you"))
    assert(nTok == 6L, s"1 + 2 + 3 whitespace tokens, got $nTok")
  }

  test("violations rank structurally first and transcript is NULL: " +
    "duplicate_turn > turn_gap > role_break > empty_message") {
    val got = run(
      // conv 1: duplicate turn AND a role break — duplicate wins
      (1L, 0L, "user", "a"), (1L, 0L, "assistant", "b"),
      // conv 2: pure gap (0 then 2)
      (2L, 0L, "user", "a"), (2L, 2L, "user", "b"),
      // conv 3: contiguous but roles do not alternate
      (3L, 0L, "user", "a"), (3L, 1L, "user", "b"),
      // conv 4: starts with the wrong role — also a role break
      (4L, 0L, "assistant", "a"), (4L, 1L, "user", "b"),
      // conv 5: alternates but one message is whitespace-only
      (5L, 0L, "user", "a"), (5L, 1L, "assistant", "  "),
      // conv 6: clean
      (6L, 0L, "user", "a"), (6L, 1L, "assistant", "b"))
    assert(got(1L)._5 == "duplicate_turn" && got(1L)._6.isEmpty)
    assert(got(2L)._5 == "turn_gap" && got(2L)._6.isEmpty)
    assert(got(3L)._5 == "role_break" && got(3L)._6.isEmpty)
    assert(got(4L)._5 == "role_break")
    assert(got(5L)._5 == "empty_message" && got(5L)._6.isEmpty)
    assert(got(6L)._5 == "ok" && got(6L)._6.contains("user: a\nassistant: b"))
  }

  test("null text counts as empty, never crashes assembly") {
    val rows = Seq((1L, 0L, "user", "a"),
      (1L, 1L, "assistant", null.asInstanceOf[String]))
    val got = Conversations.assemble(rows.toDF("c", "t", "role", "x"),
        "c", "t", "role", "x")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got(1L) == "empty_message")
  }

  test("single-message thread: a lone user turn 0 is ok by the rules") {
    val got = run((1L, 0L, "user", "hello"))
    assert(got(1L)._5 == "ok" && got(1L)._6.contains("user: hello"))
  }

  test("null role or turn → null_field, ranked before every other " +
    "check (a NULL role would otherwise PASS alternation and vanish " +
    "from the transcript)") {
    val rows = Seq[(Long, java.lang.Long, String, String)](
      (1L, 0L, "user", "a"), (1L, 1L, null, "b"),          // null role
      (2L, null, "user", "a"), (2L, 1L, "assistant", "b"), // null turn
      (3L, 0L, "user", "a"), (3L, 1L, "assistant", "b"))   // clean
      .toDF("c", "t", "role", "x")
    val got = Conversations.assemble(rows, "c", "t", "role", "x")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(5), Option(r.getString(6))))).toMap
    assert(got(1L) == (("null_field", None)),
      s"NULL role must be rejected, not pass alternation: ${got(1L)}")
    assert(got(2L)._1 == "null_field",
      s"NULL turn must read null_field, not duplicate_turn: ${got(2L)}")
    assert(got(3L)._1 == "ok" &&
      got(3L)._2.contains("user: a\nassistant: b"))
  }

  test("truncateToBudget: keeps the longest even-turn-aligned suffix " +
    "under the budget, reindexes turns, drops overflow-everywhere " +
    "threads") {
    val rows = Seq(
      // conv 1: suffixes t0=6 > 3, t1=3 (odd — ineligible), t2=2 → cut 2
      (1L, 0L, "user", "w w w"), (1L, 1L, "assistant", "x"),
      (1L, 2L, "user", "y"), (1L, 3L, "assistant", "z"),
      // conv 2: fits whole → cut 0, turns unchanged
      (2L, 0L, "user", "a"), (2L, 1L, "assistant", "b"),
      // conv 3: even the full-thread suffix overflows at its only
      // even turn → drops entirely
      (3L, 0L, "user", "p q r s"), (3L, 1L, "assistant", "t u v w"))
      .toDF("c", "t", "role", "x")
    val got = Conversations.truncateToBudget(rows, "c", "t", "role", "x",
        budgetTokens = 3L)
      .select("c", "orig_turn", "new_turn", "role")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 2L, 0L, "user"), (1L, 3L, 1L, "assistant"),
      (2L, 0L, 0L, "user"), (2L, 1L, 1L, "assistant")),
      s"wrong truncation: $got")
  }

  test("lossMask: spans are a contiguous 0-based tiling of each " +
    "thread in turn order, the mask marks exactly the assistant " +
    "turns, and token counts match the QA tokenizer") {
    val rows = Seq(
      (1L, 0L, "user", "a b c"), (1L, 1L, "assistant", "d e"),
      (1L, 2L, "user", "f"), (1L, 3L, "assistant", "g h i j"),
      (2L, 0L, "user", ""), (2L, 1L, "assistant", "x"))
      .toDF("c", "t", "role", "x")
    val got = Conversations.lossMask(rows, "c", "t", "role", "x")
      .select("c", "t", "n_tok", "start_tok", "end_tok", "mask")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 0L, 3L, 0L, 3L, false), (1L, 1L, 2L, 3L, 5L, true),
      (1L, 2L, 1L, 5L, 6L, false), (1L, 3L, 4L, 6L, 10L, true),
      (2L, 0L, 0L, 0L, 0L, false), (2L, 1L, 1L, 0L, 1L, true)),
      s"span tiling: $got")
  }

  test("streaming assembly: the changelog records cross-epoch status " +
    "transitions and latest-wins equals the batch assembler; epoch " +
    "replay is idempotent") {
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingConversations
    val base = tmpDir("sft-stream")
    val (feed, out, ckpt) = (s"$base/feed", s"$base/out", s"$base/ckpt")
    def msgs(rows: (Long, Long, String, String)*) =
      rows.toDF("conv_id", "turn", "role", "text")
    // epoch 0: conv 1 has turns 0 and 2 (a gap); conv 2 is clean
    val e0 = msgs((1L, 0L, "user", "a"), (1L, 2L, "user", "c"),
      (2L, 0L, "user", "x"), (2L, 1L, "assistant", "y"))
    // epoch 1: the gap-closing turn 1 arrives → conv 1 flips
    // turn_gap → ok; conv 3 appears with a duplicate slot
    val e1 = msgs((1L, 1L, "assistant", "b"),
      (3L, 0L, "user", "p"), (3L, 0L, "assistant", "q"))
    e0.coalesce(1).write.mode("append").parquet(feed)
    StreamingConversations.assembleStream(spark, feed, out, ckpt)
    e1.coalesce(1).write.mode("append").parquet(feed)
    val changelog = StreamingConversations.assembleStream(
      spark, feed, out, ckpt)
    val c1 = changelog.filter(col("conv_id") === 1L)
      .select("upd", "status").as[(Int, String)].collect().toMap
    assert(c1(c1.keys.min) == "turn_gap" && c1(c1.keys.max) == "ok",
      s"changelog must record the gap-closing flip: $c1")
    val got = StreamingConversations.latest(changelog)
      .collect().map(_.toSeq).toSet
    val want = Conversations.assemble(e0.unionByName(e1),
        "conv_id", "turn", "role", "text")
      .collect().map(_.toSeq).toSet
    assert(got == want, s"stream != batch:\n got=$got\n want=$want")
    // replaying the last epoch re-absorbs idempotently: the verdicts
    // (latest rows) are unchanged
    e1.coalesce(1).write.mode("append").parquet(feed)
    val replay = StreamingConversations.assembleStream(
      spark, feed, out, ckpt)
    val got2 = StreamingConversations.latest(replay)
      .collect().map(_.toSeq).toSet
    assert(got2 == want, "replayed epoch must not change any verdict")
  }
}
