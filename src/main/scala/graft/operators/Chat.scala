package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Instruction/chat-data operators — the SFT-corpus counterpart of the
  * pretraining text stack: multi-turn conversations arrive as one row per
  * turn `(conv_id, turn_idx, role, content)`, and the pipeline must (a)
  * VALIDATE the role protocol before any of it trains (a single
  * out-of-order role corrupts the loss masking downstream) and (b)
  * FLATTEN surviving conversations into the role-tagged training text,
  * trimming to a context budget from the front while never dropping the
  * system turn. Both are one-aggregate operators: conversations are the
  * natural key, turns the payload.
  */
object Chat {

  private val RoleSystem = "system"
  private val RoleUser = "user"
  private val RoleAssistant = "assistant"

  /** Per-conversation ordered turn array (sorted by the turn index — the
    * struct's FIRST field, which array_sort orders by). */
  private def turnsAgg(idxCol: String, roleCol: String, textCol: String) =
    array_sort(collect_list(struct(
      col(idxCol).as("i"), col(roleCol).as("r"), col(textCol).as("x"))))

  /** Role-protocol validation: a trainable conversation (the OpenAI/
    * ShareGPT convention every SFT stack assumes) starts with an optional
    * single `system` turn, then STRICTLY alternates `user`/`assistant`
    * starting at `user`, with no empty contents. One wrong role breaks
    * assistant-loss masking for every later turn, so `valid` gates the
    * conversation out before flattening. Output: (conv_id, n_turns,
    * starts_ok, alternates_ok, no_empty, valid).
    *
    * Scale shape: ONE conversation-keyed aggregate (turn rows shuffle
    * once, grouped map-side); all checks are array expressions over the
    * collected turn list — bounded by conversation length, never a
    * second exchange. */
  def validateTurns(turns: DataFrame, convCol: String, idxCol: String,
                    roleCol: String, textCol: String): DataFrame = {
    val t = col("_t")
    val roles = transform(t, x => x.getField("r"))
    val texts = transform(t, x => x.getField("x"))
    val afterSys = when(element_at(roles, 1) === RoleSystem,
      slice(roles, lit(2), greatest(size(roles) - 1, lit(0)))).otherwise(roles)
    val startsOk = element_at(roles, 1).isin(RoleSystem, RoleUser)
    val altOk = when(size(afterSys) === 0, lit(false))
      .otherwise(forall(
        zip_with(afterSys, sequence(lit(0), size(afterSys) - 1),
          (r, i) => r === when(i % 2 === 0, lit(RoleUser))
            .otherwise(lit(RoleAssistant))),
        x => x))
    val noEmpty = !exists(texts, x => length(x) === 0)
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(turnsAgg(idxCol, roleCol, textCol).as("_t"))
      .select(col("conv_id"),
        size(t).cast("long").as("n_turns"),
        startsOk.as("starts_ok"), altOk.as("alternates_ok"),
        noEmpty.as("no_empty"))
      .withColumn("valid",
        col("starts_ok") && col("alternates_ok") && col("no_empty"))
  }

  /** Flatten conversations to role-tagged training text
    * (`<|role|>content` lines), trimming to the LAST `keepLastTurns`
    * non-system turns while always keeping a leading system turn — the
    * standard context-budget policy (recent turns carry the signal; the
    * system prompt is load-bearing and never drops). `keepLastTurns =
    * None` keeps everything. Output: (conv_id, n_turns, n_turns_kept,
    * n_chars, text).
    *
    * Scale shape: the same single conversation-keyed aggregate as
    * [[validateTurns]]; trim + join are array expressions. Pair with a
    * hash of `text` when auditing at corpus scale — the flattened string
    * itself only needs to exist in the sink. */
  def flattenChat(turns: DataFrame, convCol: String, idxCol: String,
                  roleCol: String, textCol: String,
                  keepLastTurns: Option[Int] = None): DataFrame = {
    keepLastTurns.foreach(k =>
      require(k >= 1, s"keepLastTurns must be >= 1, got $k"))
    val t = col("_t")
    val hasSys = element_at(t, 1).getField("r") === RoleSystem
    val sysArr = when(hasSys, slice(t, 1, 1)).otherwise(slice(t, 1, 0))
    val rest = when(hasSys, slice(t, lit(2), greatest(size(t) - 1, lit(0))))
      .otherwise(t)
    val keptExpr = keepLastTurns match {
      case None => t
      case Some(k) =>
        concat(sysArr,
          when(size(rest) <= k, rest)
            .otherwise(slice(rest, size(rest) - k + 1, lit(k))))
    }
    // bind the trimmed array before consuming it twice (size + join):
    // the trim copies every kept turn's content string per construction
    // (same column-binding discipline as assistantSpans)
    val kept = col("_kept")
    val flat = array_join(transform(kept,
      x => concat(lit("<|"), x.getField("r"), lit("|>"), x.getField("x"))),
      "\n")
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(turnsAgg(idxCol, roleCol, textCol).as("_t"))
      .select(col("conv_id"), size(t).cast("long").as("n_turns"),
        keptExpr.as("_kept"))
      .select(col("conv_id"), col("n_turns"),
        size(kept).cast("long").as("n_turns_kept"),
        flat.as("text"))
      .select(col("conv_id"), col("n_turns"), col("n_turns_kept"),
        length(col("text")).cast("long").as("n_chars"), col("text"))
  }

  /** Assistant-span loss masks over [[flattenChat]]'s text: the
    * character offsets `[start_char, end_char)` of every ASSISTANT
    * turn's content in the flattened string — exactly the spans an SFT
    * loss trains on (everything else is masked). Same `keepLastTurns`
    * policy as the flatten; the two operators MUST be called with the
    * same value or the offsets point into a different string. Offsets
    * are 0-based char positions; each kept turn contributes
    * `len("<|") + len(role) + len("|>") + len(content)` plus one
    * separator `\n`. Output: one row per assistant span —
    * (conv_id, span_idx, start_char, end_char, n_label_chars).
    *
    * Scale shape: the same one conversation-keyed aggregate; offsets
    * come from a closed-form prefix sum over the kept-turn array
    * (O(turns²) array work per conversation — turn counts are small by
    * construction), then one explode of the span list. The kept-turn
    * array is BOUND to a column before the span transform: lambda bodies
    * re-evaluate referenced subexpressions once per element (the
    * [[graft.operators.Dedup.shingleHashesOverToks]] hazard), and the
    * trim expression copies every turn's content string per
    * construction — left inline it rebuilds the array ~2x per TURN
    * instead of once per conversation. */
  def assistantSpans(turns: DataFrame, convCol: String, idxCol: String,
                     roleCol: String, textCol: String,
                     keepLastTurns: Option[Int] = None): DataFrame = {
    keepLastTurns.foreach(k =>
      require(k >= 1, s"keepLastTurns must be >= 1, got $k"))
    val t = col("_t")
    val hasSys = element_at(t, 1).getField("r") === RoleSystem
    val rest = when(hasSys, slice(t, lit(2), greatest(size(t) - 1, lit(0))))
      .otherwise(t)
    val keptExpr = keepLastTurns match {
      case None => t
      case Some(k) =>
        concat(when(hasSys, slice(t, 1, 1)).otherwise(slice(t, 1, 0)),
          when(size(rest) <= k, rest)
            .otherwise(slice(rest, size(rest) - k + 1, lit(k))))
    }
    val kept = col("_kept")
    def turnLen(x: Column): Column =
      length(x.getField("r")) + length(x.getField("x")) + lit(4)
    val spans = filter(
      transform(sequence(lit(1), size(kept)), j => {
        val turn = element_at(kept, j)
        val off = coalesce(
          aggregate(slice(kept, lit(1), j - 1), lit(0),
            (acc, x) => acc + turnLen(x) + 1), lit(0))
        struct(turn.getField("r").as("role"),
          (off + lit(2) + length(turn.getField("r")) + lit(2)).as("s"),
          (off + turnLen(turn)).as("e"))
      }),
      sp => sp.getField("role") === RoleAssistant)
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(turnsAgg(idxCol, roleCol, textCol).as("_t"))
      .select(col("conv_id"), keptExpr.as("_kept"))
      .select(col("conv_id"), posexplode(spans).as(Seq("span_idx", "_sp")))
      .select(col("conv_id"),
        (col("span_idx") + 1).cast("long").as("span_idx"),
        col("_sp.s").cast("long").as("start_char"),
        col("_sp.e").cast("long").as("end_char"))
      .withColumn("n_label_chars", col("end_char") - col("start_char"))
  }

  /** Preference-pair audit — RLHF/DPO data QA: per (prompt, chosen,
    * rejected) pair, the degeneracy and length-bias signals that corrupt
    * a reward model before it trains: `identical` (chosen == rejected —
    * a zero-gradient pair), `chosen_longer` and the token-length ratio
    * (a corpus where chosen is SYSTEMATICALLY longer teaches the reward
    * model length, not quality — the classic verbosity bias; audit the
    * `chosen_longer` rate per source before training), and empty-side
    * flags. `usable` gates out degenerate pairs. Output: (id,
    * n_tokens_chosen, n_tokens_rejected, len_ratio, identical,
    * chosen_longer, usable).
    *
    * Scale shape: one zero-shuffle codegen'd projection. */
  def preferenceAudit(pairs: DataFrame, idCol: String,
                      chosenCol: String, rejectedCol: String): DataFrame = {
    val nc = size(TextAnalysis.tokens(col(chosenCol))).cast("long")
    val nr = size(TextAnalysis.tokens(col(rejectedCol))).cast("long")
    pairs.select(col(idCol),
        nc.as("n_tokens_chosen"), nr.as("n_tokens_rejected"),
        round(nc.cast("double") / nr.cast("double"), 6).as("len_ratio"),
        (col(chosenCol) === col(rejectedCol)).as("identical"),
        (nc > nr).as("chosen_longer"),
        (col(chosenCol) =!= col(rejectedCol) &&
          length(col(chosenCol)) > 0 && length(col(rejectedCol)) > 0)
          .as("usable"))
  }
}
