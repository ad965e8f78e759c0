package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Conversation-thread assembly QA — the SFT-data stage between raw
  * message logs and chat-template rendering. Instruction-tuning
  * corpora arrive as flat (conversation, turn, role, text) messages;
  * training wants one validated transcript per thread and an explicit
  * reason for every thread it rejects (the drop-ledger discipline
  * applied to dialogue):
  *
  *  - `null_field` — a message with a NULL turn or NULL role (an
  *    unplaceable message: without both, no other check can even be
  *    evaluated honestly — a NULL role compares as NULL against the
  *    expected role and would otherwise pass alternation while
  *    array_join silently dropped its NULL transcript line);
  *  - `duplicate_turn` — two messages claim the same turn slot (a
  *    re-send or merge artifact; ordering is ambiguous, the thread is
  *    unusable as-is);
  *  - `turn_gap` — turns are not contiguous from 0 (a lost message:
  *    the context the later turns answer is missing);
  *  - `role_break` — roles fail strict user/assistant alternation
  *    from `firstRole` (template renderers either crash here or
  *    silently merge turns — both poison training);
  *  - `empty_message` — a blank turn (renders as a zero-content
  *    example);
  *  - `ok` — transcript emitted.
  *
  * Violations are ranked (structural before content) and a thread
  * reports its FIRST failing check, `ok` threads get the transcript
  * assembled in turn order. Execution shape: ONE groupBy(conversation)
  * carrying sums + a collect_list of (turn, line) structs reassembled
  * via array_sort/transform (the dropRepeatedLines pattern — no window
  * over the corpus, no self-join); per-group memory is bounded by
  * thread length, never corpus size. Alternation checks are per-row
  * parity comparisons (role vs turn-parity expectation), so no
  * adjacent-row window is needed either.
  */
object Conversations {

  /** Per-thread QA + assembly over (convCol, turnCol, roleCol,
    * textCol): `(conv, n_msgs, n_turns, max_turn, n_tokens, status,
    * transcript)` — transcript (lines "role: text" in turn order,
    * newline-joined) only for `ok` threads, NULL otherwise (a
    * violating thread has no canonical rendering; for duplicate turns
    * it would not even be deterministic).
    */
  def assemble(df: DataFrame, convCol: String, turnCol: String,
               roleCol: String, textCol: String,
               firstRole: String = "user",
               secondRole: String = "assistant"): DataFrame = {
    val expected = when(col(turnCol) % 2 === 0, lit(firstRole))
      .otherwise(lit(secondRole))
    val staged = df.select(
      col(convCol),
      col(turnCol).cast("long").as(turnCol),
      col(roleCol),
      coalesce(col(textCol), lit("")).as("__text"),
      when(col(turnCol).isNull || col(roleCol).isNull, 1L)
        .otherwise(0L).as("__nullfield"),
      when(col(roleCol) =!= expected, 1L).otherwise(0L).as("__mismatch"),
      when(length(trim(coalesce(col(textCol), lit("")))) === 0, 1L)
        .otherwise(0L).as("__empty"))
    staged
      .groupBy(col(convCol))
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col(turnCol)).as("n_turns"),
        max(col(turnCol)).as("max_turn"),
        sum(TextFunctions.tokenCount(col("__text")).cast("long"))
          .as("n_tokens"),
        sum(col("__nullfield")).as("__nulls"),
        sum(col("__mismatch")).as("__mismatches"),
        sum(col("__empty")).as("__empties"),
        collect_list(struct(col(turnCol).as("t"),
          concat(col(roleCol), lit(": "), col("__text")).as("line")))
          .as("__msgs"))
      .select(col(convCol), col("n_msgs"), col("n_turns"),
        col("max_turn"), col("n_tokens"),
        when(col("__nulls") > 0, lit("null_field"))
          .when(col("n_msgs") =!= col("n_turns"), lit("duplicate_turn"))
          .when(col("max_turn") =!= col("n_turns") - 1, lit("turn_gap"))
          .when(col("__mismatches") > 0, lit("role_break"))
          .when(col("__empties") > 0, lit("empty_message"))
          .otherwise(lit("ok")).as("status"),
        when(col("__nulls") === 0 &&
            col("n_msgs") === col("n_turns") &&
            col("max_turn") === col("n_turns") - 1 &&
            col("__mismatches") === 0 && col("__empties") === 0,
          array_join(transform(array_sort(col("__msgs")),
            x => x.getField("line")), "\n"))
          .otherwise(lit(null).cast("string")).as("transcript"))
  }

  /** Context-window truncation — the SFT-prep step between thread QA
    * and packing: a thread longer than the model's window keeps its
    * most recent turns (chat context lives at the end), but the kept
    * SUFFIX must still render — it has to start on a `firstRole`
    * (even-parity) turn, or the template opens mid-exchange with an
    * unanswered assistant turn. Per message: `suf_tokens` (tokens
    * from this turn to the end), the cut = the SMALLEST even turn
    * whose suffix fits `budgetTokens`, kept turns reindex to
    * `new_turn` = turn − cut so downstream rendering/QA sees a
    * 0-based thread again. A thread whose every even-turn suffix
    * overflows drops entirely (`cut` NULL → no rows; the audit is
    * the row difference, the drop-ledger discipline).
    *
    * Shape: one suffix-cumsum window + one min-aggregation window on
    * the SAME partition key — a single shuffle on conv, no
    * self-joins; per-group memory is one running sum, never the
    * thread. Token counting is the same [[TextFunctions.tokenCount]]
    * column the QA path uses.
    *
    * Precondition: one message per turn slot (run threads through
    * [[assemble]]'s `ok` gate first — the pipeline order the gate
    * pins); with duplicate turns the suffix order, and thus the cut,
    * would be tie-dependent.
    */
  def truncateToBudget(df: DataFrame, convCol: String, turnCol: String,
                       roleCol: String, textCol: String,
                       budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"positive token budget, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val wSuf = Window.partitionBy(col(convCol))
      .orderBy(col(turnCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wConv = Window.partitionBy(col(convCol))
    val staged = df.select(col(convCol), col(turnCol).cast("long").as(turnCol),
        col(roleCol), col(textCol),
        TextFunctions.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long").as("n_tok"))
      .withColumn("suf_tokens", sum(col("n_tok")).over(wSuf))
      .withColumn("__cut",
        min(when(col(turnCol) % 2 === 0 &&
          col("suf_tokens") <= budgetTokens, col(turnCol))).over(wConv))
    staged
      .filter(col("__cut").isNotNull && col(turnCol) >= col("__cut"))
      .select(col(convCol), col(turnCol).as("orig_turn"),
        (col(turnCol) - col("__cut")).as("new_turn"),
        col(roleCol), col(textCol), col("n_tok"))
  }

  /** SFT loss-mask spans — the stage between validated threads and
    * the trainer's collator: per message, the token span it occupies
    * in the rendered thread (`start_tok` inclusive, `end_tok`
    * exclusive — a prefix cumsum of per-message token counts in turn
    * order) and `mask` = whether the span contributes to the loss
    * (the assistant-only-loss recipe: user/context turns are
    * attended but not trained on). Downstream packing can then carry
    * masks through concatenation by offsetting spans with the pack's
    * `start_offset`.
    *
    * Shape: one window on the conv key (prefix sum), token counting
    * through the SAME [[TextFunctions.tokenCount]] column as QA and
    * truncation — one tokenizer, no drift. Exact integers; the whole
    * relation replays in SQL. Precondition as [[truncateToBudget]]:
    * one message per turn slot (run [[assemble]]'s `ok` gate first),
    * else span order is tie-dependent.
    */
  def lossMask(df: DataFrame, convCol: String, turnCol: String,
               roleCol: String, textCol: String,
               maskRole: String = "assistant"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(convCol), col(turnCol).cast("long").as(turnCol),
        col(roleCol),
        TextFunctions.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long").as("n_tok"))
      .withColumn("end_tok", sum(col("n_tok")).over(w))
      .select(col(convCol), col(turnCol), col(roleCol), col("n_tok"),
        (col("end_tok") - col("n_tok")).as("start_tok"), col("end_tok"),
        (col(roleCol) === maskRole).as("mask"))
  }
}
