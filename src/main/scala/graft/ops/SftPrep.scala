package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT (supervised fine-tuning) data preparation — the step between a
  * curated corpus and a trainable chat dataset: multi-turn
  * conversations render into one template string per conversation, and
  * the trainer needs to know WHICH character ranges carry loss
  * (assistant content only — the standard "mask the prompt" SFT
  * convention), plus a deterministic way to fit long conversations
  * into a context budget.
  *
  * Both operators are exact integer/string math over an ordered
  * per-conversation fold, so outputs are reproducible at any
  * parallelism and restatable by any engine (q143/q144's DuckDB twins
  * re-derive every offset from window sums over the same turn order).
  *
  * Scale shape: one hash shuffle on the conversation key; per-group
  * state is one conversation (the document grain every other text
  * operator already carries) — there is no corpus-wide state, so both
  * operators ride a single groupBy at 100 TB.
  */
object SftPrep {

  private val Footer = "\n<|end|>\n"

  private def header(role: Column): Column =
    concat(lit("<|"), role, lit("|>\n"))

  /** Render each conversation to the role-token template
    * {{{<|role|>\ncontent\n<|end|>\n  (per turn, in turn order)}}}
    * and emit the loss-mask spans: 1-based [content_start, content_end)
    * character intervals of every `maskRole` turn's content inside the
    * rendered text — exactly the ranges an SFT loss masks IN (labels
    * everywhere else are ignored). Offsets come from the same ordered
    * fold that builds the text, so they can never drift from it.
    *
    * Turn order is `turnCol` ascending (callers guarantee uniqueness
    * per conversation — the array_sort tie would otherwise compare
    * role/content); null content renders as empty. Conversations keep
    * a row even when no turn matches `maskRole` (empty span array).
    *
    * @return (convCol, text, n_turns, n_masked_turns, mask_spans
    *         array<struct<turn_idx,content_start,content_end>>,
    *         n_mask_chars)
    */
  def renderConversations(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String, contentCol: String,
      maskRole: String = "assistant"): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      col(turnCol).cast("int").as("ti"),
      col(roleCol).cast("string").as("role"),
      coalesce(col(contentCol), lit("")).as("content"))))
    val spanType = "array<struct<turn_idx:int," +
      "content_start:bigint,content_end:bigint>>"
    val zero = struct(lit(0L).as("off"), lit("").as("txt"),
      array().cast(spanType).as("spans"), lit(0L).as("mask_chars"))
    val folded = aggregate(sorted, zero, (acc, t) => {
      val h = header(t.getField("role"))
      val c = t.getField("content")
      val isMask = t.getField("role") === lit(maskRole)
      val start = acc.getField("off") + length(h) + 1
      val end = start + length(c)
      struct(
        (acc.getField("off") + length(h) + length(c) +
          lit(Footer.length.toLong)).as("off"),
        concat(acc.getField("txt"), h, c, lit(Footer)).as("txt"),
        when(isMask, concat(acc.getField("spans"),
            array(struct(t.getField("ti").as("turn_idx"),
              start.as("content_start"), end.as("content_end")))))
          .otherwise(acc.getField("spans")).as("spans"),
        (acc.getField("mask_chars") +
          when(isMask, length(c).cast("long")).otherwise(lit(0L)))
          .as("mask_chars"))
    })
    turns.groupBy(col(convCol))
      .agg(folded.as("__st"),
        count(lit(1)).as("n_turns"),
        sum(when(col(roleCol) === maskRole, 1L).otherwise(0L))
          .as("n_masked_turns"))
      .select(col(convCol), col("__st.txt").as("text"),
        col("n_turns"), col("n_masked_turns"),
        col("__st.spans").as("mask_spans"),
        col("__st.mask_chars").as("n_mask_chars"))
  }

  /** Fit each conversation into a token budget by dropping the OLDEST
    * droppable turns first (the standard chat-truncation policy):
    * `pinRole` turns (system prompts) are always kept, and of the rest
    * the maximal SUFFIX in turn order whose tokens — plus the pinned
    * turns' — stay within `budgetTokens` survives. Tokens per turn =
    * whitespace word count of the content plus `perTurnOverhead`
    * (template markers). A turn whose tokens alone exceed the
    * remaining budget drops along with everything before it — the
    * suffix property (a conversation must stay contiguous from some
    * cut point) is the invariant trainers rely on.
    *
    * Pure window math over the conversation key — the decision for a
    * turn is `pinned OR (tokens from it to the end) + pinned_tokens <=
    * budget`, one reverse cumulative sum; exact integers, so any
    * engine restates every flag (q144).
    *
    * @return input grain: (convCol, turnCol, roleCol, n_tokens,
    *         kept boolean) — feed the kept rows to
    *         [[renderConversations]]
    */
  def fitContextBudget(turns: DataFrame, convCol: String, turnCol: String,
      roleCol: String, contentCol: String, budgetTokens: Long,
      pinRole: String = "system", perTurnOverhead: Int = 3): DataFrame = {
    require(budgetTokens >= 1,
      s"budgetTokens must be >= 1, got $budgetTokens")
    require(perTurnOverhead >= 0,
      s"perTurnOverhead must be >= 0, got $perTurnOverhead")
    import org.apache.spark.sql.expressions.Window
    val nTokens = (size(split(trim(coalesce(col(contentCol), lit(""))),
      "\\s+")) + perTurnOverhead).cast("long")
    val pinned = col(roleCol) === lit(pinRole)
    val base = turns.select(col(convCol), col(turnCol), col(roleCol),
      nTokens.as("n_tokens"), pinned.as("__pin"))
    // pinned total per conversation (broadcast-sized per group — it is
    // a window agg, no second shuffle: same partitioning key)
    val wConv = Window.partitionBy(col(convCol))
    val wSuffix = Window.partitionBy(col(convCol))
      .orderBy(col(turnCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pinTotal = sum(when(col("__pin"), col("n_tokens"))
      .otherwise(lit(0L))).over(wConv)
    // reverse running sum over the DROPPABLE turns only: pinned turns
    // contribute zero here (they are counted once via pinTotal)
    val suffixTokens = sum(when(col("__pin"), lit(0L))
      .otherwise(col("n_tokens"))).over(wSuffix)
    base
      .withColumn("kept", col("__pin") ||
        (suffixTokens + pinTotal) <= budgetTokens)
      .select(col(convCol), col(turnCol), col(roleCol),
        col("n_tokens"), col("kept"))
  }
}
