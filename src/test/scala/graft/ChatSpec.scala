package graft

import graft.operators.Chat
import org.apache.spark.sql.functions._

class ChatSpec extends SparkSuite {
  import spark.implicits._

  private val turns = Seq(
    // conv 1: canonical system + user/assistant — valid
    (1L, 0L, "system", "be brief"), (1L, 1L, "user", "hi"),
    (1L, 2L, "assistant", "hello"),
    // conv 2: no system turn, still valid
    (2L, 0L, "user", "q"), (2L, 1L, "assistant", "a"),
    // conv 3: assistant replies first after system — alternation breach
    (3L, 0L, "system", "s"), (3L, 1L, "assistant", "a"),
    // conv 4: empty user turn
    (4L, 0L, "system", "s"), (4L, 1L, "user", ""), (4L, 2L, "assistant", "a"),
    // conv 5: assistant-first, no system — starts_ok and alternation fail
    (5L, 0L, "assistant", "a"),
    // conv 6: system only — nothing trainable
    (6L, 0L, "system", "s")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("validateTurns: each protocol breach trips exactly its flag") {
    val out = Chat.validateTurns(turns, "conv_id", "turn_idx", "role", "content")
      .orderBy("conv_id")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out === Array(
      (1L, 3L, true, true, true, true),
      (2L, 2L, true, true, true, true),
      (3L, 2L, true, false, true, false),
      (4L, 3L, true, true, false, false),
      (5L, 1L, false, false, true, false),
      (6L, 1L, true, false, true, false)))
  }

  test("flattenChat: system turn survives the last-k trim; short convs untouched") {
    val long = Seq(
      (9L, 0L, "system", "sys"), (9L, 1L, "user", "u1"), (9L, 2L, "assistant", "a1"),
      (9L, 3L, "user", "u2"), (9L, 4L, "assistant", "a2"),
      (9L, 5L, "user", "u3"), (9L, 6L, "assistant", "a3")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val t9 = Chat.flattenChat(long, "conv_id", "turn_idx", "role", "content",
      keepLastTurns = Some(4)).as[(Long, Long, Long, Long, String)].head()
    // 7 turns -> system + LAST 4 of the 6 non-system = 5 kept; u1/a1 dropped
    assert(t9._2 === 7L && t9._3 === 5L)
    assert(t9._5 ===
      "<|system|>sys\n<|user|>u2\n<|assistant|>a2\n<|user|>u3\n<|assistant|>a3")
    assert(t9._4 === t9._5.length.toLong)
    // a short no-system conv keeps everything, order by idx
    val t2 = Chat.flattenChat(turns.where(col("conv_id") === 2),
      "conv_id", "turn_idx", "role", "content", keepLastTurns = Some(4))
      .as[(Long, Long, Long, Long, String)].head()
    assert(t2._3 === 2L && t2._5 === "<|user|>q\n<|assistant|>a")
    // no trim: identity on turn count
    val full = Chat.flattenChat(long, "conv_id", "turn_idx", "role", "content")
      .as[(Long, Long, Long, Long, String)].head()
    assert(full._3 === 7L)
    intercept[IllegalArgumentException](Chat.flattenChat(
      long, "conv_id", "turn_idx", "role", "content", Some(0)))
  }

  test("assistantSpans: every span substrings to exactly its assistant content") {
    val long = Seq(
      (9L, 0L, "system", "sys"), (9L, 1L, "user", "u1"), (9L, 2L, "assistant", "a1"),
      (9L, 3L, "user", "uu2"), (9L, 4L, "assistant", "answer two"),
      (9L, 5L, "user", "u3"), (9L, 6L, "assistant", "a3"),
      (2L, 0L, "user", "q"), (2L, 1L, "assistant", "the reply")
    ).toDF("conv_id", "turn_idx", "role", "content")
    for (keep <- Seq(None, Some(4))) {
      val flat = Chat.flattenChat(long, "conv_id", "turn_idx", "role", "content", keep)
        .select("conv_id", "text").as[(Long, String)].collect().toMap
      val spans = Chat.assistantSpans(long, "conv_id", "turn_idx", "role", "content", keep)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(spans.nonEmpty)
      spans.foreach { case (cid, _, s, e, n) =>
        val sub = flat(cid).substring(s.toInt, e.toInt)
        assert(n === e - s)
        // the masked region is exactly one assistant content: preceded by
        // the assistant tag, ending at a separator or end-of-text
        assert(flat(cid).substring(0, s.toInt).endsWith("<|assistant|>"),
          s"span [$s,$e) of conv $cid not tag-aligned")
        assert(e.toInt == flat(cid).length || flat(cid).charAt(e.toInt) == '\n')
        assert(!sub.contains("<|"), s"span leaked a tag: '$sub'")
      }
    }
    // trimmed conv 9 keeps spans for a2/a3 only (a1 dropped with its turn)
    val trimmed = Chat.assistantSpans(long, "conv_id", "turn_idx", "role",
      "content", Some(4)).where(col("conv_id") === 9)
    assert(trimmed.count() === 2)
  }

  test("preferenceAudit flags degenerate pairs and the verbosity bias") {
    val pairs = Seq(
      (1L, "a good long detailed answer", "short one"),  // chosen longer, usable
      (2L, "same text", "same text"),                    // identical -> unusable
      (3L, "brief", "a longer rejected answer here"),    // chosen shorter
      (4L, "has content", "")                            // empty rejected -> unusable
    ).toDF("doc_id", "chosen", "rejected")
    val out = Chat.preferenceAudit(pairs, "doc_id", "chosen", "rejected")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean, Boolean, Boolean)].collect()
    assert(out(0) === ((1L, 5L, 2L, 2.5, false, true, true)))
    assert(out(1)._5 && !out(1)._7)             // identical, unusable
    assert(!out(2)._6 && out(2)._7)             // chosen shorter, still usable
    assert(!out(3)._7)                          // empty side, unusable
    // the corpus-level bias rate this audit exists for
    assert(out.count(r => r._7 && r._6) === 1)
  }
}
