"""Side tools: hash checker, file cutter, task submission, user scripts
(parity with the reference's BatchHashChecker / FileCutter / AddTask /
ScriptCommand / UserScriptExecuter utilities)."""
