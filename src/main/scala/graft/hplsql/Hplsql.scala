package graft.hplsql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Procedural SQL interpreter — the engine's analog of the reference's
  * HPL/SQL module (ref hplsql/src/main/antlr4/org/apache/hive/hplsql/
  * Hplsql.g4, ~2000 lines of grammar; this implements the procedural core a
  * script actually exercises):
  *
  *   - DECLARE vars (with DEFAULT/:=), SET / `:=` assignment
  *   - IF / ELSIF / ELSEIF / ELSE / END IF
  *   - WHILE ... LOOP|DO ... END LOOP|WHILE, LOOP ... END LOOP,
  *     EXIT [WHEN cond] / BREAK
  *   - FOR i IN [REVERSE] a .. b [BY step] LOOP ... END LOOP
  *   - FOR rec IN (SELECT ...) LOOP ... END LOOP   (cursor-for; rec.col vars)
  *   - BEGIN ... [EXCEPTION WHEN OTHERS THEN ...] END
  *   - DECLARE CONTINUE|EXIT HANDLER FOR SQLEXCEPTION|NOT FOUND <stmt>
  *   - PRINT expr, RETURN [expr], EXECUTE [IMMEDIATE] expr [INTO v, ...]
  *   - SELECT ... INTO v, ... FROM ...
  *   - CREATE [OR REPLACE] PROCEDURE|FUNCTION ... BEGIN ... END; CALL p(...)
  *   - CREATE [OR REPLACE] PACKAGE [BODY] pkg AS ... END — package-scoped
  *     variables shared across member calls; CALL pkg.proc(...), pkg.fn()
  *     in expressions (ref hplsql/src/main/java/org/apache/hive/hplsql/
  *     Package.java)
  *   - every other statement passes through verbatim to the engine's SQL
  *     front door (so CTAS / INSERT / UPDATE / MERGE / snapshot verbs all
  *     work inside scripts), with declared variables substituted as literals
  *     — the reference's variable-interpolation behavior.
  *
  * Control flow runs on the driver (as in the reference, where HPL/SQL is a
  * client-side interpreter); every data-touching statement is a full Spark
  * plan, so scale behavior of the data path is unchanged.
  *
  * Deliberately out of scope (grammar rows that are client/dialect shims):
  * COPY/CMP/TD-specific statements. Explicit OPEN/FETCH/CLOSE
  * cursors ARE implemented (with SQLCODE maintenance), streaming one
  * partition at a time, and so are condition handlers: DECLARE
  * CONTINUE|EXIT HANDLER FOR SQLEXCEPTION|SQLWARNING|NOT FOUND <stmt>
  * (block-scoped, innermost-first; NOT FOUND fires on row-less
  * FETCH/SELECT INTO) alongside the block-level EXCEPTION WHEN OTHERS.
  */
object Hplsql {

  final case class Result(
      printed: Seq[String],
      returned: Option[Any],
      lastResult: Option[DataFrame],
      variables: Map[String, Any])

  def run(spark: SparkSession, script: String)
      (implicit sqlRunner: String => DataFrame = spark.sql(_)): Result = {
    val interp = new Interpreter(spark, sqlRunner)
    interp.runScript(script)
  }

  // ====================================================== statement model
  private sealed trait Stmt
  private case class Declare(names: Seq[String], dtype: Option[String], init: Option[String]) extends Stmt
  private case class Assign(name: String, expr: String) extends Stmt
  private case class If(arms: Seq[(String, Seq[Stmt])], otherwise: Seq[Stmt]) extends Stmt
  private case class While(cond: String, body: Seq[Stmt]) extends Stmt
  private case class Loop(body: Seq[Stmt]) extends Stmt
  private case class ForRange(v: String, from: String, to: String, step: Option[String],
      reverse: Boolean, body: Seq[Stmt]) extends Stmt
  private case class ForCursor(v: String, query: String, body: Seq[Stmt]) extends Stmt
  private case class DeclareCursor(name: String, query: String) extends Stmt
  private case class OpenCur(name: String) extends Stmt
  private case class FetchCur(name: String, into: Seq[String]) extends Stmt
  private case class CloseCur(name: String) extends Stmt
  private case class Exit(when: Option[String]) extends Stmt
  private case class DeclareHandler(mode: String, cond: String,
      body: Seq[Stmt]) extends Stmt
  private case class Block(body: Seq[Stmt], handler: Option[Seq[Stmt]]) extends Stmt
  private case class Print(expr: String) extends Stmt
  private case class Return(expr: Option[String]) extends Stmt
  private case class ExecImmediate(expr: String, into: Seq[String]) extends Stmt
  private case class SelectInto(query: String, into: Seq[String]) extends Stmt
  private case class CreatePackage(name: String, isBody: Boolean,
      vars: Seq[Declare], routines: Seq[CreateRoutine],
      replace: Boolean) extends Stmt
  private case class CreateRoutine(name: String, params: Seq[(String, Option[String])],
      body: Seq[Stmt], isFunction: Boolean, replace: Boolean) extends Stmt
  private case class Call(name: String, args: Seq[String]) extends Stmt
  private case class RawSql(sql: String) extends Stmt

  private case class BreakSignal() extends RuntimeException
  private case class ReturnSignal(value: Option[Any]) extends RuntimeException
  /** Thrown by an EXIT handler to seal the block that DECLAREd it. */
  private final class ExitBlockSignal(val frame: AnyRef) extends RuntimeException

  // ============================================================ tokenizer
  /** Token: (text, startOffset). Strings keep their quotes; comments are
    * dropped. Multi-char operators `:=` and `..` are single tokens.
    */
  private def tokenize(s: String): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2); i = if (e < 0) n else e + 2
      } else if (c == '\'' || c == '"') {
        val start = i; i += 1
        while (i < n && !(s.charAt(i) == c && !(i + 1 < n && s.charAt(i + 1) == c))) {
          if (s.charAt(i) == c && i + 1 < n && s.charAt(i + 1) == c) i += 2 else i += 1
        }
        i = math.min(i + 1, n)
        out += ((s.substring(start, i), start))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += ((s.substring(start, i), start))
      } else if (c.isDigit) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.') &&
          !(s.charAt(i) == '.' && i + 1 < n && s.charAt(i + 1) == '.')) i += 1
        out += ((s.substring(start, i), start))
      } else if (c == ':' && i + 1 < n && s.charAt(i + 1) == '=') {
        out += ((":=", i)); i += 2
      } else if (c == '.' && i + 1 < n && s.charAt(i + 1) == '.') {
        out += (("..", i)); i += 2
      } else {
        out += ((c.toString, i)); i += 1
      }
    }
    out.result()
  }

  // =============================================================== parser
  private final class Parser(src: String) {
    private val toks = tokenize(src)
    private var pos = 0

    private def peek(k: Int = 0): String =
      if (pos + k < toks.length) toks(pos + k)._1 else ""
    private def peekUpper(k: Int = 0): String = peek(k).toUpperCase
    private def next(): String = { val t = peek(); pos += 1; t }
    private def expect(word: String): Unit = {
      if (peekUpper() != word.toUpperCase)
        fail(s"expected $word, found '${peek()}'")
      pos += 1
    }
    private def accept(word: String): Boolean =
      if (peekUpper() == word.toUpperCase) { pos += 1; true } else false
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"HPL/SQL parse error: $msg" +
        (if (pos < toks.length) s" at offset ${toks(pos)._2}" else " at end"))
    private def atEnd: Boolean = pos >= toks.length

    /** Raw source text between two token indices (inclusive start,
      * exclusive end) — preserves the original spelling of embedded SQL.
      */
    private def textBetween(fromTok: Int, toTok: Int): String = {
      if (fromTok >= toTok) return ""
      val start = toks(fromTok)._2
      val end =
        if (toTok < toks.length) {
          val (t, off) = toks(toTok - 1); off + t.length
        } else src.length
      src.substring(start, end).trim
    }

    def parseProgram(): Seq[Stmt] = {
      val out = mutable.Buffer.empty[Stmt]
      while (!atEnd) {
        if (peek() == ";") { pos += 1 }
        else out += parseStmt()
      }
      out.toSeq
    }

    /** Parse statements until one of `terminators` (upper-case keywords) is
      * the lookahead; does not consume the terminator.
      */
    private def parseBlockUntil(terminators: Set[String]): Seq[Stmt] = {
      val out = mutable.Buffer.empty[Stmt]
      while (!atEnd && !terminators.contains(peekUpper())) {
        if (peek() == ";") pos += 1
        else out += parseStmt()
      }
      out.toSeq
    }

    private def parseStmt(): Stmt = peekUpper() match {
      case "DECLARE" => parseDeclare()
      case "SET" if isAssignHead(1) => parseSet()
      case "IF" => parseIf()
      case "WHILE" => parseWhile()
      case "LOOP" => pos += 1; val b = parseBlockUntil(Set("END")); expect("END"); expect("LOOP"); endSemi(); Loop(b)
      case "FOR" => parseFor()
      case "EXIT" | "BREAK" => parseExit()
      case "BEGIN" => parseBegin()
      case "PRINT" => pos += 1; val e = exprUntilSemi(); Print(e)
      case "RETURN" =>
        pos += 1
        if (peek() == ";" || atEnd) { endSemi(); Return(None) }
        else Return(Some(exprUntilSemi()))
      case "OPEN" => pos += 1; val n = next(); endSemi(); OpenCur(n)
      case "FETCH" =>
        pos += 1
        if (peekUpper() == "FROM") pos += 1
        val n = next()
        expect("INTO")
        val vars = mutable.Buffer(next())
        while (peek() == ",") { pos += 1; vars += next() }
        endSemi()
        FetchCur(n, vars.toSeq)
      case "CLOSE" => pos += 1; val n = next(); endSemi(); CloseCur(n)
      case "EXEC" | "EXECUTE" => parseExecute()
      case "CALL" => parseCall()
      case "CREATE" if isPackageHead() => parsePackage()
      case "CREATE" if isRoutineHead() => parseCreateRoutine()
      case "SELECT" if selectIntoVars().nonEmpty => parseSelectInto()
      case _ if isAssignHead(0) => parseSet(noSetKeyword = true)
      case _ => parseRawSql()
    }

    private def endSemi(): Unit = { if (peek() == ";") pos += 1 }

    /** `name :=` or (for SET) `name =` at offset k. */
    private def isAssignHead(k: Int): Boolean = {
      val id = peek(k)
      if (id.isEmpty || !(id.charAt(0).isLetter || id.charAt(0) == '_')) return false
      val op = peek(k + 1)
      op == ":=" || (k > 0 && op == "=")
    }

    private def parseDeclare(): Stmt = {
      expect("DECLARE")
      // DECLARE CONTINUE|EXIT HANDLER FOR SQLEXCEPTION|SQLWARNING|NOT FOUND
      // <stmt> (ref hplsql/src/main/antlr4/.../Hplsql.g4
      // declare_handler_item) — the condition-handler surface beyond the
      // block-level EXCEPTION WHEN OTHERS
      if ((peekUpper() == "CONTINUE" || peekUpper() == "EXIT") &&
          peekUpper(1) == "HANDLER") {
        val mode = next().toUpperCase
        expect("HANDLER"); expect("FOR")
        val cond = peekUpper() match {
          case "SQLEXCEPTION" => pos += 1; "SQLEXCEPTION"
          case "SQLWARNING" => pos += 1; "SQLWARNING"
          case "NOT" => pos += 1; expect("FOUND"); "NOT_FOUND"
          case other => fail(s"unsupported handler condition: $other")
        }
        val body = parseStmt()
        return DeclareHandler(mode, cond, Seq(body))
      }
      val names = mutable.Buffer(next())
      // DECLARE c CURSOR FOR|IS <query> — explicit-cursor declaration
      // (ref hplsql/src/main/antlr4/.../Hplsql.g4 declare_cursor_item)
      if (peekUpper() == "CURSOR") {
        pos += 1
        if (!accept("FOR")) expect("IS")
        return DeclareCursor(names.head, exprUntilSemi())
      }
      while (peek() == ",") { pos += 1; names += next() }
      // optional type: keep tokens until := / DEFAULT / ; (type itself unused
      // beyond documentation — values are dynamically typed, as in HPL/SQL)
      val typeStart = pos
      while (!atEnd && peek() != ";" && peek() != ":=" && peekUpper() != "DEFAULT") pos += 1
      val dtype = if (pos > typeStart) Some(textBetween(typeStart, pos)) else None
      val init =
        if (peek() == ":=" || peekUpper() == "DEFAULT") { pos += 1; Some(exprUntilSemi(consumeSemi = false)) }
        else None
      endSemi()
      Declare(names.toSeq, dtype, init)
    }

    private def parseSet(noSetKeyword: Boolean = false): Stmt = {
      if (!noSetKeyword) expect("SET")
      val name = next()
      if (peek() == ":=" || peek() == "=") pos += 1 else fail("expected := or =")
      Assign(name, exprUntilSemi())
    }

    /** Expression text up to the statement-ending `;` at depth 0. */
    private def exprUntilSemi(consumeSemi: Boolean = true): String = {
      val start = pos
      var depth = 0
      while (!atEnd && !(depth == 0 && peek() == ";")) {
        if (peek() == "(") depth += 1
        if (peek() == ")") depth -= 1
        pos += 1
      }
      val e = textBetween(start, pos)
      if (consumeSemi) endSemi()
      e
    }

    /** Expression text up to a keyword at depth 0. */
    private def exprUntilKeyword(kws: Set[String]): String = {
      val start = pos
      var depth = 0
      while (!atEnd && !(depth == 0 && kws.contains(peekUpper()))) {
        if (peek() == "(") depth += 1
        if (peek() == ")") depth -= 1
        pos += 1
      }
      textBetween(start, pos)
    }

    private def parseIf(): Stmt = {
      expect("IF")
      val arms = mutable.Buffer.empty[(String, Seq[Stmt])]
      var cond = exprUntilKeyword(Set("THEN"))
      expect("THEN")
      var body = parseBlockUntil(Set("ELSIF", "ELSEIF", "ELSE", "END"))
      arms += ((cond, body))
      var otherwise: Seq[Stmt] = Nil
      while (peekUpper() == "ELSIF" || peekUpper() == "ELSEIF") {
        pos += 1
        cond = exprUntilKeyword(Set("THEN")); expect("THEN")
        body = parseBlockUntil(Set("ELSIF", "ELSEIF", "ELSE", "END"))
        arms += ((cond, body))
      }
      if (accept("ELSE")) otherwise = parseBlockUntil(Set("END"))
      expect("END"); expect("IF"); endSemi()
      If(arms.toSeq, otherwise)
    }

    private def parseWhile(): Stmt = {
      expect("WHILE")
      val cond = exprUntilKeyword(Set("LOOP", "DO"))
      val tsql = peekUpper() == "DO"
      pos += 1 // LOOP or DO
      val body = parseBlockUntil(Set("END"))
      expect("END")
      if (tsql) expect("WHILE") else expect("LOOP")
      endSemi()
      While(cond, body)
    }

    private def parseFor(): Stmt = {
      expect("FOR")
      val v = next()
      expect("IN")
      if (peek() == "(") {
        // cursor form: FOR rec IN (SELECT ...) LOOP
        val start = pos
        var depth = 0
        do {
          if (peek() == "(") depth += 1
          if (peek() == ")") depth -= 1
          pos += 1
        } while (!atEnd && depth > 0)
        val raw = textBetween(start, pos)
        val query = raw.stripPrefix("(").stripSuffix(")").trim
        expect("LOOP")
        val body = parseBlockUntil(Set("END"))
        expect("END"); expect("LOOP"); endSemi()
        ForCursor(v, query, body)
      } else {
        val reverse = accept("REVERSE")
        val from = exprUntilKeyword(Set(".."))
        expect("..")
        val to = exprUntilKeyword(Set("BY", "LOOP"))
        val step = if (accept("BY")) Some(exprUntilKeyword(Set("LOOP"))) else None
        expect("LOOP")
        val body = parseBlockUntil(Set("END"))
        expect("END"); expect("LOOP"); endSemi()
        ForRange(v, from, to, step, reverse, body)
      }
    }

    private def parseExit(): Stmt = {
      pos += 1 // EXIT | BREAK
      val when = if (accept("WHEN")) Some(exprUntilSemi(consumeSemi = false)) else None
      endSemi()
      Exit(when)
    }

    private def parseBegin(): Stmt = {
      expect("BEGIN")
      val body = parseBlockUntil(Set("EXCEPTION", "END"))
      val handler =
        if (accept("EXCEPTION")) {
          expect("WHEN"); expect("OTHERS"); expect("THEN")
          Some(parseBlockUntil(Set("END")))
        } else None
      expect("END"); endSemi()
      Block(body, handler)
    }

    private def parseExecute(): Stmt = {
      pos += 1 // EXEC | EXECUTE
      accept("IMMEDIATE")
      val e = exprUntilKeyword(Set("INTO", ";"))
      val into =
        if (accept("INTO")) {
          val vs = mutable.Buffer(next())
          while (peek() == ",") { pos += 1; vs += next() }
          vs.toSeq
        } else Nil
      endSemi()
      ExecImmediate(e, into)
    }

    private def parseCall(): Stmt = {
      expect("CALL")
      var name = next()
      // pkg.proc — package-qualified routine names (ref hplsql Package.java)
      if (peek() == ".") { pos += 1; name += "." + next() }
      val args = mutable.Buffer.empty[String]
      if (accept("(")) {
        while (peek() != ")") {
          val start = pos
          var depth = 0
          while (!atEnd && !(depth == 0 && (peek() == "," || peek() == ")"))) {
            if (peek() == "(") depth += 1
            if (peek() == ")") depth -= 1
            pos += 1
          }
          args += textBetween(start, pos)
          if (peek() == ",") pos += 1
        }
        expect(")")
      }
      endSemi()
      Call(name, args.toSeq)
    }

    private def isRoutineHead(): Boolean = {
      var k = 1
      if (peekUpper(k) == "OR" && peekUpper(k + 1) == "REPLACE") k += 2
      val w = peekUpper(k)
      w == "PROCEDURE" || w == "FUNCTION" || w == "PROC"
    }

    private def isPackageHead(): Boolean = {
      var k = 1
      if (peekUpper(k) == "OR" && peekUpper(k + 1) == "REPLACE") k += 2
      peekUpper(k) == "PACKAGE"
    }

    /** CREATE [OR REPLACE] PACKAGE [BODY] name [AS|IS] ... END [name];
      * (ref hplsql/src/main/java/org/apache/hive/hplsql/Package.java +
      * Hplsql.g4 create_package_stmt / create_package_body_stmt). The spec
      * holds package variables (shared state, no DECLARE keyword) and
      * routine forward declarations; the body holds the implementations.
      * Both are parsed leniently with the same item loop — a routine with
      * a body is kept wherever it appears, a forward declaration
      * (`PROCEDURE p(...);`) is recorded by its later implementation.
      */
    private def parsePackage(): Stmt = {
      expect("CREATE")
      val replace = if (accept("OR")) { expect("REPLACE"); true } else false
      expect("PACKAGE")
      val isBody = accept("BODY")
      val name = next()
      if (!accept("AS")) accept("IS")
      val vars = mutable.Buffer.empty[Declare]
      val routines = mutable.Buffer.empty[CreateRoutine]
      while (!atEnd && peekUpper() != "END") {
        val w = peekUpper()
        if (w == "PROCEDURE" || w == "FUNCTION" || w == "PROC") {
          // forward declaration (`;` before any BEGIN) vs implementation
          var k = pos
          var decl = false
          var found = false
          while (!found && k < toks.length) {
            val t = toks(k)._1.toUpperCase
            if (t == ";") { decl = true; found = true }
            else if (t == "BEGIN") found = true
            k += 1
          }
          if (decl) { while (peek() != ";") pos += 1; endSemi() }
          else routines += parseRoutine(replace = true)
        } else {
          // package variable: name [dtype] [:= init | DEFAULT init];
          val vname = next()
          val typeStart = pos
          while (!atEnd && peek() != ";" && peek() != ":=" &&
            peekUpper() != "DEFAULT") pos += 1
          val dtype =
            if (pos > typeStart) Some(textBetween(typeStart, pos)) else None
          val init =
            if (peek() == ":=" || peekUpper() == "DEFAULT") {
              pos += 1; Some(exprUntilSemi(consumeSemi = false))
            } else None
          endSemi()
          vars += Declare(Seq(vname), dtype, init)
        }
      }
      expect("END")
      if (!atEnd && peek() != ";" &&
        peek().headOption.exists(c => c.isLetter || c == '_')) pos += 1
      endSemi()
      CreatePackage(name, isBody, vars.toSeq, routines.toSeq, replace)
    }

    private def parseCreateRoutine(): Stmt = {
      expect("CREATE")
      val replace = if (accept("OR")) { expect("REPLACE"); true } else false
      parseRoutine(replace)
    }

    /** Routine starting at its PROCEDURE | FUNCTION | PROC keyword. */
    private def parseRoutine(replace: Boolean): CreateRoutine = {
      val isFunction = peekUpper() == "FUNCTION"
      pos += 1 // PROCEDURE | FUNCTION | PROC
      val name = next()
      val params = mutable.Buffer.empty[(String, Option[String])]
      if (accept("(")) {
        while (peek() != ")") {
          val pname = next()
          val tStart = pos
          var depth = 0
          while (!atEnd && !(depth == 0 && (peek() == "," || peek() == ")"))) {
            if (peek() == "(") depth += 1
            if (peek() == ")") depth -= 1
            pos += 1
          }
          params += ((pname, if (pos > tStart) Some(textBetween(tStart, pos)) else None))
          if (peek() == ",") pos += 1
        }
        expect(")")
      }
      // RETURNS/RETURN type (functions), IS/AS sugar — skip to BEGIN
      while (!atEnd && peekUpper() != "BEGIN") pos += 1
      expect("BEGIN")
      val body = parseBlockUntil(Set("END"))
      expect("END")
      // optional trailing name echo: END p;
      if (!atEnd && peek() != ";" && peek().headOption.exists(c => c.isLetter || c == '_')) pos += 1
      endSemi()
      CreateRoutine(name, params.toSeq, body, isFunction, replace)
    }

    /** If this SELECT has a top-level INTO clause, its variable names. */
    private def selectIntoVars(): Seq[String] = {
      var k = 0
      var depth = 0
      while (pos + k < toks.length && !(depth == 0 && toks(pos + k)._1 == ";")) {
        val t = toks(pos + k)._1
        if (t == "(") depth += 1
        else if (t == ")") depth -= 1
        else if (depth == 0 && t.equalsIgnoreCase("INTO")) {
          val vs = mutable.Buffer.empty[String]
          var j = k + 1
          var expectName = true
          while (pos + j < toks.length && {
            val w = toks(pos + j)._1
            if (expectName && (w.headOption.exists(c => c.isLetter || c == '_'))) {
              vs += w; expectName = false; true
            } else if (!expectName && w == ",") { expectName = true; true }
            else false
          }) j += 1
          return vs.toSeq
        }
        k += 1
      }
      Nil
    }

    private def parseSelectInto(): Stmt = {
      // capture raw SELECT, remove the INTO clause
      val start = pos
      var depth = 0
      var intoStart = -1
      var intoEnd = -1
      while (!atEnd && !(depth == 0 && peek() == ";")) {
        val t = peek()
        if (t == "(") depth += 1
        else if (t == ")") depth -= 1
        else if (depth == 0 && t.equalsIgnoreCase("INTO") && intoStart < 0) {
          intoStart = pos
          pos += 1
          var expectName = true
          var done = false
          while (!atEnd && !done) {
            val w = peek()
            if (expectName && w.headOption.exists(c => c.isLetter || c == '_')) {
              pos += 1; expectName = false
            } else if (!expectName && w == ",") { pos += 1; expectName = true }
            else done = true
          }
          intoEnd = pos
          pos -= 1 // will be advanced below
        }
        pos += 1
      }
      val stmtEnd = pos
      endSemi()
      val vars = toks.slice(intoStart + 1, intoEnd).map(_._1).filter(_ != ",")
      val query = textBetween(start, intoStart) + " " + textBetween(intoEnd, stmtEnd)
      SelectInto(query, vars)
    }

    private def parseRawSql(): Stmt = {
      val start = pos
      var depth = 0
      while (!atEnd && !(depth == 0 && peek() == ";")) {
        if (peek() == "(") depth += 1
        if (peek() == ")") depth -= 1
        pos += 1
      }
      val sql = textBetween(start, pos)
      endSemi()
      RawSql(sql)
    }
  }

  // ========================================================== interpreter
  private final class Interpreter(spark: SparkSession, sqlRunner: String => DataFrame) {
    private val scopes = mutable.Stack[mutable.LinkedHashMap[String, Any]](
      mutable.LinkedHashMap.empty)
    private val routines = mutable.Map.empty[String, CreateRoutine]
    // packages: shared variable state + member routines, addressed as
    // pkg.routine (ref hplsql Package.java — an in-session registry there
    // too; state lives for the script run, like top-level routines)
    private final class PackageState {
      val vars = mutable.LinkedHashMap.empty[String, Any]
      val members = mutable.Map.empty[String, CreateRoutine]
    }
    private val packages = mutable.Map.empty[String, PackageState]
    private val printed = mutable.Buffer.empty[String]
    private var lastDf: Option[DataFrame] = None
    // explicit cursors (OPEN/FETCH/CLOSE): driver-side row iterators by
    // the HPL/SQL cursor contract; FETCH maintains SQLCODE (0 = row
    // fetched, 100 = exhausted — the reference's convention)
    private final class CursorState(val query: String) {
      var it: Iterator[org.apache.spark.sql.Row] = Iterator.empty
      var open = false
    }
    private val cursors = mutable.Map.empty[String, CursorState]
    private def cursorOf(name: String): CursorState =
      cursors.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(s"unknown cursor $name"))

    def runScript(script: String): Result = {
      val prog = new Parser(script).parseProgram()
      val frame = mutable.Buffer.empty[DeclareHandler]
      handlerFrames.push(frame)
      val returned =
        try { execSeq(prog, frame); None }
        catch {
          case ReturnSignal(v) => v
          case e: ExitBlockSignal if e.frame eq frame => None
        }
        finally handlerFrames.pop()
      Result(printed.toSeq, returned, lastDf,
        scopes.toSeq.reverse.flatMap(_.toSeq).toMap)
    }

    // ---------------------------------------------------------- variables
    private def declare(name: String, v: Any): Unit =
      scopes.top.put(name.toLowerCase, v)
    private def lookup(name: String): Option[Any] = {
      val k = name.toLowerCase
      scopes.collectFirst { case m if m.contains(k) => m(k) }
    }
    private def assign(name: String, v: Any): Unit = {
      val k = name.toLowerCase
      scopes.find(_.contains(k)) match {
        case Some(m) => m.put(k, v)
        case None => scopes.top.put(k, v) // implicit declare, HPL/SQL style
      }
    }
    private def allVars: Seq[(String, Any)] =
      scopes.toSeq.flatMap(_.toSeq) // top of stack first = innermost wins

    // -------------------------------------------------------- evaluation
    private def literal(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: java.sql.Date => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
      case b: Array[Byte] => "X'" + b.map("%02X".format(_)).mkString + "'"
      case other => other.toString
    }

    /** Substitute declared variables (and rec.col fields) into SQL text as
      * literals — skipping quoted strings. Longest names first so `rec.col`
      * wins over a variable named `rec`.
      */
    private def substitute(sqlText: String): String = {
      val vars = allVars
      if (vars.isEmpty) return sqlText
      val names = vars.map(_._1).distinct.sortBy(-_.length)
      // allVars is innermost-first; toMap keeps the LAST duplicate, so
      // reverse first — shadowed outer declarations must not win
      val valueOf = vars.reverse.toMap
      val pattern = names.map(n => java.util.regex.Pattern.quote(n))
        .mkString("(?i)(?<![A-Za-z0-9_.])(", "|", ")(?![A-Za-z0-9_.])")
      val rx = pattern.r
      // split into string-literal and non-literal spans; substitute the latter
      val out = new StringBuilder
      var i = 0
      while (i < sqlText.length) {
        val c = sqlText.charAt(i)
        if (c == '\'') {
          val start = i; i += 1
          while (i < sqlText.length && !(sqlText.charAt(i) == '\'' &&
            !(i + 1 < sqlText.length && sqlText.charAt(i + 1) == '\''))) {
            if (sqlText.charAt(i) == '\'') i += 2 else i += 1
          }
          i = math.min(i + 1, sqlText.length)
          out.append(sqlText.substring(start, i))
        } else {
          val start = i
          while (i < sqlText.length && sqlText.charAt(i) != '\'') i += 1
          val span = sqlText.substring(start, i)
          out.append(rx.replaceAllIn(span, m =>
            java.util.regex.Matcher.quoteReplacement(
              literal(valueOf(m.group(1).toLowerCase)))))
        }
      }
      out.toString
    }

    /** Evaluate a scalar expression: user-function calls are interpreted
      * first; then a local fast path handles the scripting core (literals,
      * variables, arithmetic, ||, comparisons, AND/OR/NOT) without a Spark
      * round-trip — loop-control expressions cost nanoseconds, not a plan.
      * Anything beyond it (SQL functions, subqueries, mixed coercions)
      * falls back to Spark `SELECT (expr)` for exact engine semantics.
      */
    private def eval(expr: String): Any = {
      val withFns = evalFunctionCalls(expr)
      FastEval.tryEval(withFns, name => lookup(name)).getOrElse {
        val sub = substitute(withFns)
        val row = sqlRunner(s"SELECT (${sub}) AS __v").collect()(0)
        if (row.isNullAt(0)) null else row.get(0)
      }
    }

    private def evalBool(expr: String): Boolean = eval(expr) match {
      case b: Boolean => b
      case null => false
      case other => other.toString.toBoolean
    }

    /** Replace `f(args)` calls to interpreted FUNCTIONs with their computed
      * literal result (innermost-first would need full parsing; one level of
      * non-nested calls covers the scripting idiom).
      */
    private def evalFunctionCalls(expr: String): String = {
      val fns: Seq[(String, CreateRoutine, Option[PackageState])] =
        routines.toSeq.collect { case (n, r) if r.isFunction => (n, r, None) } ++
        packages.toSeq.flatMap { case (pn, ps) =>
          ps.members.toSeq.collect { case (n, r) if r.isFunction =>
            (s"$pn.$n", r, Some(ps)) }
        }
      if (fns.isEmpty) return expr
      var out = expr
      fns.foreach { case (name, r, pkg) =>
        val rx = ("(?i)(?<![A-Za-z0-9_.])" + java.util.regex.Pattern.quote(name) +
          "\\s*\\(([^()]*)\\)").r
        out = rx.replaceAllIn(out, m => {
          val args = splitArgs(m.group(1))
          java.util.regex.Matcher.quoteReplacement(
            literal(invoke(r, args.map(eval), pkg)))
        })
      }
      out
    }

    private def splitArgs(s: String): Seq[String] = {
      if (s.trim.isEmpty) return Nil
      val out = mutable.Buffer.empty[String]
      var depth = 0; var start = 0; var inStr = false
      for (i <- s.indices) {
        val c = s.charAt(i)
        if (c == '\'') inStr = !inStr
        else if (!inStr && c == '(') depth += 1
        else if (!inStr && c == ')') depth -= 1
        else if (!inStr && depth == 0 && c == ',') { out += s.substring(start, i); start = i + 1 }
      }
      out += s.substring(start)
      out.toSeq.map(_.trim)
    }

    private def invoke(r: CreateRoutine, argValues: Seq[Any],
        pkg: Option[PackageState] = None): Any = {
      // a package member sees the package's variable frame UNDER its
      // locals: assignments to package variables mutate the SHARED map, so
      // state persists across calls — the package contract
      pkg.foreach(ps => scopes.push(ps.vars))
      scopes.push(mutable.LinkedHashMap.empty)
      try {
        r.params.zipWithIndex.foreach { case ((pname, _), i) =>
          declare(pname, if (i < argValues.length) argValues(i) else null)
        }
        try { r.body.foreach(exec); null }
        catch { case ReturnSignal(v) => v.orNull }
      } finally {
        scopes.pop()
        pkg.foreach(_ => scopes.pop())
      }
    }

    // --------------------------------------------------------- execution
    /** Handler frames: one per block (innermost on top). DECLAREd
      * handlers attach to the frame of the block that declared them and
      * cover its remaining statements plus nested blocks without their
      * own matching handler — the HPL/SQL handler-scope contract.
      */
    private val handlerFrames =
      mutable.Stack[mutable.Buffer[DeclareHandler]]()

    private def findHandler(cond: String)
        : Option[(AnyRef, DeclareHandler)] =
      handlerFrames.iterator.flatMap(f =>
        f.findLast(_.cond == cond).map(h => (f: AnyRef, h))).nextOption()

    private def runHandler(frame: AnyRef, h: DeclareHandler): Unit = {
      h.body.foreach(exec)
      if (h.mode == "EXIT") throw new ExitBlockSignal(frame)
    }

    /** NOT FOUND fires after a FETCH/SELECT INTO that found no row (the
      * statement itself stays non-throwing: SQLCODE 100 is the normal
      * signal, the handler is opt-in).
      */
    private def fireNotFound(): Unit =
      findHandler("NOT_FOUND").foreach { case (f, h) => runHandler(f, h) }

    /** One block's statement list with per-statement handler dispatch:
      * a raising statement consults the innermost SQLEXCEPTION handler —
      * CONTINUE resumes at the next statement, EXIT seals the declaring
      * block; with no handler the exception propagates (to an enclosing
      * block's handlers, a legacy WHEN OTHERS, or the caller).
      */
    private def execSeq(stmts: Seq[Stmt], frame: AnyRef): Unit =
      stmts.foreach { st =>
        try exec(st)
        catch {
          case s @ (BreakSignal() | ReturnSignal(_)) => throw s
          case s: ExitBlockSignal => throw s
          case NonFatal(e) =>
            findHandler("SQLEXCEPTION") match {
              case Some((f, h)) =>
                assign("sqlerrm", e.getMessage)
                assign("sqlcode", -1L)
                runHandler(f, h)
              case None => throw e
            }
        }
      }

    private def exec(stmt: Stmt): Unit = stmt match {
      case Declare(names, _, init) =>
        val v = init.map(eval).orNull
        names.foreach(declare(_, v))

      case Assign(name, expr) => assign(name, eval(expr))

      case If(arms, otherwise) =>
        arms.find(a => evalBool(a._1)) match {
          case Some((_, body)) => execSeq(body, handlerFrames.top)
          case None => execSeq(otherwise, handlerFrames.top)
        }

      case While(cond, body) =>
        try while (evalBool(cond)) execSeq(body, handlerFrames.top)
        catch { case BreakSignal() => }

      case Loop(body) =>
        try while (true) execSeq(body, handlerFrames.top)
        catch { case BreakSignal() => }

      case ForRange(v, fromE, toE, stepE, reverse, body) =>
        val from = eval(fromE).toString.toDouble
        val to = eval(toE).toString.toDouble
        val step = math.abs(stepE.map(e => eval(e).toString.toDouble).getOrElse(1.0))
        val isWhole = from == from.longValue && to == to.longValue && step == step.longValue
        var i = if (reverse) to else from
        def cont = if (reverse) i >= from else i <= to
        scopes.push(mutable.LinkedHashMap.empty)
        try {
          while (cont) {
            declare(v, if (isWhole) i.longValue else i)
            execSeq(body, handlerFrames.top)
            i = if (reverse) i - step else i + step
          }
        } catch { case BreakSignal() => }
        finally scopes.pop()

      case ForCursor(v, query, body) =>
        val df = sqlRunner(substitute(query))
        lastDf = Some(df)
        // cursor loops are driver-side by definition, but STREAMED: one
        // partition's rows at a time, so a loop that exits early never
        // materializes the full result on the driver. Visibility contract:
        // iteration observes storage as partitions are FETCHED (like a
        // paging JDBC cursor) — a body that rewrites the cursor's own
        // table's files (plain-parquet COW + VACUUM RETAIN 0) should
        // materialize first (CREATE TEMP VIEW ... or snapshot tables,
        // whose superseded files survive until vacuum)
        val rows = df.toLocalIterator().asScala
        val cols = df.columns
        scopes.push(mutable.LinkedHashMap.empty)
        try {
          rows.foreach { row =>
            cols.zipWithIndex.foreach { case (c, i) =>
              declare(s"$v.$c", if (row.isNullAt(i)) null else row.get(i))
            }
            execSeq(body, handlerFrames.top)
          }
        } catch { case BreakSignal() => }
        finally scopes.pop()

      case DeclareCursor(n, q) =>
        cursors.put(n.toLowerCase, new CursorState(q))

      case OpenCur(n) =>
        val c = cursorOf(n)
        val df = sqlRunner(substitute(c.query))
        lastDf = Some(df)
        // streamed, not collect()ed: FETCH-ing 3 rows from a billion-row
        // cursor pulls one partition, not a full driver materialization
        c.it = df.toLocalIterator().asScala
        c.open = true

      case FetchCur(n, into) =>
        val c = cursorOf(n)
        if (!c.open) throw new IllegalArgumentException(s"cursor $n is not open")
        if (c.it.hasNext) {
          val row = c.it.next()
          into.zipWithIndex.foreach { case (v, i) =>
            assign(v, if (i < row.length && !row.isNullAt(i)) row.get(i) else null)
          }
          assign("sqlcode", 0L)
        } else {
          assign("sqlcode", 100L) // into-vars keep their last values
          fireNotFound()
        }

      case CloseCur(n) =>
        val c = cursorOf(n)
        c.open = false
        c.it = Iterator.empty

      case Exit(when) =>
        if (when.forall(evalBool)) throw BreakSignal()

      case h: DeclareHandler => handlerFrames.top += h

      case Block(body, handler) =>
        scopes.push(mutable.LinkedHashMap.empty)
        val frame = mutable.Buffer.empty[DeclareHandler]
        // EXCEPTION WHEN OTHERS is the block's own innermost handler: it
        // seeds the frame as an EXIT-mode SQLEXCEPTION handler, so it (a)
        // wins over OUTER declared handlers for failures in THIS block and
        // (b) can never swallow an outer EXIT handler's seal signal
        handler.foreach(h => frame += DeclareHandler("EXIT", "SQLEXCEPTION", h))
        handlerFrames.push(frame)
        try execSeq(body, frame)
        catch {
          case e: ExitBlockSignal if e.frame eq frame => ()
          case e: ExitBlockSignal => throw e
          case s @ (BreakSignal() | ReturnSignal(_)) => throw s
        }
        finally { handlerFrames.pop(); scopes.pop() }

      case Print(expr) =>
        val v = eval(expr)
        printed += (if (v == null) "null" else v.toString)

      case Return(expr) => throw ReturnSignal(expr.map(eval))

      case ExecImmediate(expr, into) =>
        val sqlText = eval(expr).toString
        val df = sqlRunner(sqlText)
        lastDf = Some(df)
        if (into.nonEmpty) {
          val row = df.collect().headOption
          into.zipWithIndex.foreach { case (v, i) =>
            assign(v, row.flatMap(r => if (r.isNullAt(i)) None else Some(r.get(i))).orNull)
          }
        }

      case SelectInto(query, into) =>
        val df = sqlRunner(substitute(query))
        lastDf = Some(df)
        val row = df.collect().headOption
        into.zipWithIndex.foreach { case (v, i) =>
          assign(v, row.flatMap(r => if (r.isNullAt(i)) None else Some(r.get(i))).orNull)
        }
        assign("sqlcode", if (row.isDefined) 0L else 100L)
        if (row.isEmpty) fireNotFound()

      case r @ CreateRoutine(name, _, _, _, replace) =>
        if (!replace && routines.contains(name.toLowerCase))
          throw new IllegalArgumentException(s"routine $name already exists")
        routines.put(name.toLowerCase, r)

      case CreatePackage(name, isBody, vars, rts, replace) =>
        val key = name.toLowerCase
        if (!isBody && !replace && packages.contains(key))
          throw new IllegalArgumentException(s"package $name already exists")
        // a fresh spec resets state; a body attaches to the existing spec
        // (or creates one — lenient, matching the reference's registry)
        val ps =
          if (!isBody) { val s = new PackageState; packages.put(key, s); s }
          else packages.getOrElseUpdate(key, new PackageState)
        vars.foreach { d =>
          val v = d.init.map(eval).orNull
          d.names.foreach(n => ps.vars.put(n.toLowerCase, v))
        }
        rts.foreach(r => ps.members.put(r.name.toLowerCase, r))

      case Call(name, args) =>
        name.split('.') match {
          case Array(pn, rn) =>
            val ps = packages.getOrElse(pn.toLowerCase,
              throw new IllegalArgumentException(s"unknown package $pn"))
            val r = ps.members.getOrElse(rn.toLowerCase,
              throw new IllegalArgumentException(
                s"unknown procedure $rn in package $pn"))
            invoke(r, args.map(eval), Some(ps))
          case _ =>
            val r = routines.getOrElse(name.toLowerCase,
              throw new IllegalArgumentException(s"unknown procedure $name"))
            invoke(r, args.map(eval))
        }

      case RawSql(sql) =>
        val df = sqlRunner(substitute(sql))
        lastDf = Some(df)
    }
  }

  // ==================================================== local fast eval
  /** Local evaluator for the scripting-expression core. Mirrors the engine's
    * (non-ANSI) SQL semantics for the cases it accepts — `/` is always
    * double, `||` concatenates stringified operands, three-valued NULL
    * propagation — and REFUSES (returns None) anything it cannot reproduce
    * bit-for-bit: SQL function calls, subqueries, BigDecimal operands,
    * string-to-number coercions. Refusal falls back to a real Spark plan.
    */
  private[graft] object FastEval {
    private case class Unsupported() extends RuntimeException

    def tryEval(expr: String, vars: String => Option[Any]): Option[Any] =
      try {
        val toks = tokenize(expr).map(_._1)
        val p = new P(toks, vars)
        val v = p.parseOr()
        if (!p.atEnd) throw Unsupported()
        Some(v)
      } catch {
        // overflow (addExact) must also fall back: Spark's non-ANSI
        // semantics wrap, and the fallback reproduces that exactly
        case _: Unsupported | _: NumberFormatException | _: ArithmeticException => None
      }

    private final class P(toks: Vector[String], vars: String => Option[Any]) {
      private var pos = 0
      def atEnd: Boolean = pos >= toks.length
      private def peek: String = if (atEnd) "" else toks(pos)
      private def peekUpper: String = peek.toUpperCase
      private def next(): String = { val t = peek; pos += 1; t }

      private def norm(v: Any): Any = v match {
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case f: Float => f.toDouble
        case _: java.math.BigDecimal | _: BigDecimal => throw Unsupported()
        case other => other
      }

      def parseOr(): Any = {
        var l = parseAnd()
        while (peekUpper == "OR") {
          pos += 1; val r = parseAnd()
          l = bool3(l, r, (a, b) => a || b, anyTrue = true)
        }
        l
      }
      private def parseAnd(): Any = {
        var l = parseNot()
        while (peekUpper == "AND") {
          pos += 1; val r = parseNot()
          l = bool3(l, r, (a, b) => a && b, anyTrue = false)
        }
        l
      }
      // SQL three-valued logic: true OR null = true, false AND null = false
      private def bool3(l: Any, r: Any, op: (Boolean, Boolean) => Boolean,
          anyTrue: Boolean): Any = (l, r) match {
        case (a: Boolean, b: Boolean) => op(a, b)
        case (null, b: Boolean) => if (b == anyTrue) b else null
        case (a: Boolean, null) => if (a == anyTrue) a else null
        case (null, null) => null
        case _ => throw Unsupported()
      }
      private def parseNot(): Any = {
        if (peekUpper == "NOT") {
          pos += 1
          parseNot() match {
            case b: Boolean => !b
            case null => null
            case _ => throw Unsupported()
          }
        } else parseCmp()
      }
      private def parseCmp(): Any = {
        val l = parseConcat()
        val op = peek match {
          case "=" | "<" | ">" | "!" => buildCmpOp()
          case _ => return l
        }
        val r = parseConcat()
        if (l == null || r == null) return null
        (l, r) match {
          case (a: Long, b: Long) => cmpResult(java.lang.Long.compare(a, b), op)
          case (a: Double, b: Double) => cmpResult(java.lang.Double.compare(a, b), op)
          case (a: Long, b: Double) => cmpResult(java.lang.Double.compare(a.toDouble, b), op)
          case (a: Double, b: Long) => cmpResult(java.lang.Double.compare(a, b.toDouble), op)
          case (a: String, b: String) => cmpResult(a.compareTo(b), op)
          case (a: Boolean, b: Boolean) => cmpResult(java.lang.Boolean.compare(a, b), op)
          case _ => throw Unsupported()
        }
      }
      private def buildCmpOp(): String = {
        val a = next()
        (a, peek) match {
          case ("<", "=") => pos += 1; "<="
          case ("<", ">") => pos += 1; "<>"
          case (">", "=") => pos += 1; ">="
          case ("!", "=") => pos += 1; "<>"
          case ("<", _) => "<"
          case (">", _) => ">"
          case ("=", _) => "="
          case _ => throw Unsupported()
        }
      }
      private def cmpResult(c: Int, op: String): Boolean = op match {
        case "=" => c == 0
        case "<>" => c != 0
        case "<" => c < 0
        case "<=" => c <= 0
        case ">" => c > 0
        case ">=" => c >= 0
      }
      private def parseConcat(): Any = {
        var l = parseAdd()
        while (peek == "|" && pos + 1 < toks.length && toks(pos + 1) == "|") {
          pos += 2
          val r = parseAdd()
          l = if (l == null || r == null) null else str(l) + str(r)
        }
        l
      }
      private def str(v: Any): String = v match {
        case s: String => s
        case other => other.toString // Long/Double/Boolean render as Spark casts them
      }
      private def parseAdd(): Any = {
        var l = parseMul()
        while (peek == "+" || (peek == "-" && !atEnd)) {
          val op = next()
          val r = parseMul()
          l = arith(l, r, op)
        }
        l
      }
      private def parseMul(): Any = {
        var l = parseUnary()
        while (peek == "*" || peek == "/" || peek == "%") {
          val op = next()
          val r = parseUnary()
          l = arith(l, r, op)
        }
        l
      }
      private def arith(l: Any, r: Any, op: String): Any = {
        if (l == null || r == null) return null
        (l, r) match {
          case (a: Long, b: Long) => op match {
            case "+" => math.addExact(a, b)
            case "-" => math.subtractExact(a, b)
            case "*" => math.multiplyExact(a, b)
            case "/" => if (b == 0) null else a.toDouble / b // non-ANSI: int/int -> double
            case "%" => if (b == 0) null else a % b
          }
          case _ =>
            val (a, b) = (toD(l), toD(r))
            op match {
              case "+" => a + b
              case "-" => a - b
              case "*" => a * b
              case "/" => if (b == 0) null else a / b
              case "%" => if (b == 0) null else a % b
            }
        }
      }
      private def toD(v: Any): Double = v match {
        case a: Long => a.toDouble
        case a: Double => a
        case _ => throw Unsupported()
      }
      private def parseUnary(): Any = peek match {
        case "-" => pos += 1
          parseUnary() match {
            case a: Long => -a
            case a: Double => -a
            case null => null
            case _ => throw Unsupported()
          }
        case "+" => pos += 1; parseUnary()
        case _ => parsePrimary()
      }
      private def parsePrimary(): Any = {
        val t = next()
        if (t.isEmpty) throw Unsupported()
        if (t == "(") {
          val v = parseOr()
          if (next() != ")") throw Unsupported()
          return v
        }
        if (t.head == '\'') {
          if (t.length < 2 || t.last != '\'') throw Unsupported()
          return t.substring(1, t.length - 1).replace("''", "'")
        }
        if (t.head.isDigit) {
          // non-integer literals are DECIMAL in Spark SQL (scale-bearing
          // division/modulo semantics a double cannot reproduce — caught by
          // the randomized net) — refuse and fall back; integer literals
          // and already-Double VARIABLES are exact on the fast path
          if (t.contains('.')) throw Unsupported()
          return t.toLong
        }
        t.toUpperCase match {
          case "TRUE" => return true
          case "FALSE" => return false
          case "NULL" => return null
          case _ =>
        }
        if (t.head.isLetter || t.head == '_') {
          if (peek == "(") throw Unsupported() // SQL function call
          // rec.col compound name
          val name =
            if (peek == "." && pos + 1 < toks.length) { val f = toks(pos + 1); pos += 2; s"$t.$f" }
            else t
          return vars(name).map(norm).getOrElse(throw Unsupported())
        }
        throw Unsupported()
      }
    }
  }
}
