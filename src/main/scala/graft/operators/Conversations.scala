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
}
