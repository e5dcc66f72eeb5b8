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
}
